"""Domain-mixture sampling: downsample each source so the output
corpus hits a target mixture, at the largest size the inputs allow —
the "data mixing" stage of an LLM training pipeline (upweight curated
sources, cap web crawl), expressed deterministically so re-runs and
engines agree row-for-row.

Math (all exact integers, shared with the oracle): target weights
w_s (here derived from the source id: (id mod 4) + 1, standing in for
a mixing config), W = Σw_s. The largest virtual corpus honoring the
mixture is scale = min_s floor(n_s · W / w_s); each source then keeps
~scale·w_s/W rows via the deterministic per-mille hash threshold
t_s = floor(scale · w_s · 1000 / (W · n_s)) — accept iff
h(doc_id) mod 1000 < t_s, with the repo's md5-family hash
(functions/hashing.py), so the kept SET (not just the count) is
reproducible and joinable across tables.

Scale: one aggregation for the per-source counts (tiny relation —
sources number in the hundreds), broadcast back; the corpus pass is a
single filter, no shuffle of the big table at all. Threshold
quantization to 1/1000 bounds mixture error at 0.1% per source —
tighten the denominator for finer control at no extra cost.

Reference: no counterpart (single-query engine); north-star LLM-data
infrastructure alongside sampling.py's flat hash sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash32, stable_hash32_sql
from ..functions.text import tokens_sql
from ..sources.registry import load_table
from ..session import track_cache

MILLE = 1000

_W_SPARK = "(cast(substring(source, 4, 8) as int) % 4) + 1"
_W_DUCK = "(CAST(substring(source, 4, 8) AS INTEGER) % 4) + 1"


def mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture-sampling report: input size, the per-mille
    acceptance threshold that realizes the target mixture, and the
    kept count under the deterministic hash."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # tiny (one row per source) but feeds four plan branches: cache so
    # the documents aggregation runs once
    srcs = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_input"))
        .select("source", "n_input", F.expr(_W_SPARK).cast("long").alias("w"))
        .transform(track_cache)
    )
    totals = srcs.agg(F.sum("w").alias("big_w"))
    scaled = srcs.join(F.broadcast(totals)).select(
        "source",
        "n_input",
        "w",
        "big_w",
        F.expr("(n_input * big_w) div w").alias("cap"),
    )
    scale = scaled.agg(F.min("cap").alias("scale"))
    thresh = scaled.join(F.broadcast(scale)).select(
        "source",
        "n_input",
        F.expr(f"(scale * w * {MILLE}) div (big_w * n_input)").alias(
            "thresh_millis"
        ),
    )
    kept = (
        docs.join(F.broadcast(thresh), "source")
        .filter(
            stable_hash32(F.col("doc_id").cast("string")) % MILLE
            < F.col("thresh_millis")
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        thresh.join(F.broadcast(kept), "source", "left")
        .select(
            "source",
            "n_input",
            "thresh_millis",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


MIXTURE_SQL = f"""
WITH srcs AS (
  SELECT source, count(*) AS n_input,
         CAST({_W_DUCK} AS BIGINT) AS w
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(w) AS BIGINT) AS big_w FROM srcs
), scaled AS (
  SELECT s.*, t.big_w, (s.n_input * t.big_w) // s.w AS cap
  FROM srcs s CROSS JOIN tot t
), sc AS (
  SELECT min(cap) AS scale FROM scaled
), thresh AS (
  SELECT source, n_input,
         CAST((sc.scale * w * {MILLE}) // (big_w * n_input) AS BIGINT)
           AS thresh_millis
  FROM scaled CROSS JOIN sc
), kept AS (
  SELECT d.source, count(*) AS n_kept
  FROM documents d JOIN thresh t ON d.source = t.source
  WHERE {stable_hash32_sql("CAST(d.doc_id AS VARCHAR)")} % {MILLE}
        < t.thresh_millis
  GROUP BY d.source
)
SELECT t.source,
       CAST(t.n_input AS BIGINT)       AS n_input,
       t.thresh_millis,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM thresh t LEFT JOIN kept k ON t.source = k.source
ORDER BY t.source
"""


TEMP_BUDGET_DIV = 2  # sample half the corpus at the tempered mixture


def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-corpus
    standard, mC4/PaLM style): sampling weight w_s ∝ n_s^α with
    α = 1/2, which upweights small sources relative to proportional
    sampling. Cross-engine exactness: IEEE sqrt is correctly rounded
    in both engines, so w_s = floor(sqrt(n_s)·1000) is bit-stable,
    and everything after it is integer arithmetic — target_s =
    min(n_s, B·w_s div W) for budget B = total div 2, realized by the
    same deterministic per-mille doc_id-hash threshold as
    mixture_sample_docs (the kept SET is reproducible, not just the
    counts). upweight_ppm records each source's tempered share over
    its proportional share.

    Scale: identical plan shape to mixture_sample_docs — one
    per-source aggregation, broadcast thresholds, one filter pass."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    srcs = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_input"))
        .select(
            "source",
            "n_input",
            F.floor(F.sqrt(F.col("n_input")) * MILLE)
            .cast("long")
            .alias("w"),
        )
        .transform(track_cache)
    )
    totals = srcs.agg(
        F.sum("w").alias("big_w"), F.sum("n_input").alias("n_total")
    )
    thresh = srcs.join(F.broadcast(totals)).select(
        "source",
        "n_input",
        "w",
        F.least(
            F.col("n_input"),
            F.expr(f"((n_total div {TEMP_BUDGET_DIV}) * w) div big_w"),
        ).alias("target"),
        F.col("n_total"),
    ).select(
        "source",
        "n_input",
        "target",
        F.expr(f"(target * {MILLE}) div n_input").alias("thresh_millis"),
        F.expr("(target * n_total * 1000000) div (n_input * (n_total div "
               f"{TEMP_BUDGET_DIV}))").alias("upweight_ppm"),
    )
    kept = (
        docs.join(F.broadcast(thresh), "source")
        .filter(
            stable_hash32(F.col("doc_id").cast("string")) % MILLE
            < F.col("thresh_millis")
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        thresh.join(F.broadcast(kept), "source", "left")
        .select(
            "source",
            F.col("n_input").cast("long").alias("n_input"),
            F.col("target").cast("long").alias("target"),
            F.col("thresh_millis").cast("long").alias("thresh_millis"),
            F.col("upweight_ppm").cast("long").alias("upweight_ppm"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


TEMPERATURE_SQL = f"""
WITH srcs AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_input,
         CAST(floor(sqrt(count(*)) * {MILLE}) AS BIGINT) AS w
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(w) AS BIGINT) AS big_w,
         CAST(sum(n_input) AS BIGINT) AS n_total
  FROM srcs
), thresh AS (
  SELECT s.source, s.n_input,
         least(s.n_input,
               ((t.n_total // {TEMP_BUDGET_DIV}) * s.w) // t.big_w) AS target,
         t.n_total
  FROM srcs s CROSS JOIN tot t
), th AS (
  SELECT source, n_input, target,
         (target * {MILLE}) // n_input AS thresh_millis,
         (target * n_total * 1000000)
           // (n_input * (n_total // {TEMP_BUDGET_DIV})) AS upweight_ppm
  FROM thresh
), kept AS (
  SELECT d.source, count(*) AS n_kept
  FROM documents d JOIN th t ON d.source = t.source
  WHERE {stable_hash32_sql("CAST(d.doc_id AS VARCHAR)")} % {MILLE}
        < t.thresh_millis
  GROUP BY d.source
)
SELECT t.source,
       CAST(t.n_input AS BIGINT) AS n_input,
       CAST(t.target AS BIGINT) AS target,
       CAST(t.thresh_millis AS BIGINT) AS thresh_millis,
       CAST(t.upweight_ppm AS BIGINT) AS upweight_ppm,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM th t LEFT JOIN kept k ON t.source = k.source
ORDER BY t.source
"""


DSIR_D = 64  # hashed-feature buckets
DSIR_K = 50  # docs selected from the raw pool
# target domain: the curated sources the raw pool should look like
_DSIR_TARGET = ("src0", "src1")


def dsir_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023, public): score every raw-pool document by how much more
    likely its hashed-unigram features are under a target-domain
    bag-of-features model than under the raw-pool model, and keep the
    top-K. Deterministic variant: the stochastic Gumbel resampling step
    is replaced by exact top-K on the importance weight, so engines
    agree row-for-row.

    Math (cross-engine exact): features are stable_hash32(token) mod
    D. With per-bucket token counts ct/cr over target/raw corpora and
    totals Nt/Nr, the add-one-smoothed log-likelihood ratio per bucket
    is llr(b) = ln((ct+1)(Nr+D) / ((cr+1)(Nt+D))) — integer products
    collapsed into ONE double division, quantized to micro-nats
    (the pmi_token_pairs libm-parity treatment). A document's weight
    is Σ_b n_b(doc)·llr6(b): an exact int64 dot product of its bucket
    counts with the quantized ratio vector.

    Scale: one token explode + one (doc_id, bucket) partial-agg
    shuffle for the whole corpus; the bucket statistics relation is D
    rows (broadcast), and selection is orderBy().limit(K) —
    TakeOrderedAndProject, never a data-sized single partition."""
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    dbc = track_cache(
        docs.select(
            "doc_id",
            F.col("source").isin(*_DSIR_TARGET).alias("is_target"),
            F.explode(tokens("text")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            "is_target",
            F.pmod(stable_hash32(F.col("tok")), F.lit(DSIR_D)).alias("b"),
        )
        .groupBy("doc_id", "is_target", "b")
        .agg(F.count("*").alias("c"))
    )
    stats = (
        dbc.groupBy("b")
        .agg(
            F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0)).alias(
                "ct"
            ),
            F.sum(F.when(~F.col("is_target"), F.col("c")).otherwise(0)).alias(
                "cr"
            ),
        )
    )
    totals = stats.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    llr = stats.join(F.broadcast(totals)).select(
        "b",
        F.floor(
            F.log(
                ((F.col("ct") + 1) * (F.col("nr") + DSIR_D)).cast("double")
                / ((F.col("cr") + 1) * (F.col("nt") + DSIR_D)).cast("double")
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("llr6"),
    )
    weights = (
        dbc.filter(~F.col("is_target"))
        .join(F.broadcast(llr), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("llr6")).cast("long").alias("weight_micro"))
    )
    return (
        weights.join(docs.select("doc_id", "source"), "doc_id")
        .orderBy(F.desc("weight_micro"), "doc_id")
        .limit(DSIR_K)
        .select("doc_id", "source", "weight_micro")
    )


DSIR_SQL = f"""
WITH tok AS (
  SELECT doc_id, source IN {_DSIR_TARGET} AS is_target,
         unnest({tokens_sql("text")}) AS tok
  FROM documents
), dbc AS (
  SELECT doc_id, is_target,
         ({stable_hash32_sql("tok")}) % {DSIR_D} AS b,
         count(*) AS c
  FROM tok WHERE tok <> ''
  GROUP BY doc_id, is_target, b
), stats AS (
  SELECT b,
         sum(CASE WHEN is_target THEN c ELSE 0 END) AS ct,
         sum(CASE WHEN NOT is_target THEN c ELSE 0 END) AS cr
  FROM dbc GROUP BY b
), totals AS (
  SELECT sum(ct) AS nt, sum(cr) AS nr FROM stats
), llr AS (
  SELECT b,
         CAST(floor(ln(CAST((ct + 1) * (nr + {DSIR_D}) AS DOUBLE)
                       / CAST((cr + 1) * (nt + {DSIR_D}) AS DOUBLE))
                    * 1e6 + 0.5) AS BIGINT) AS llr6
  FROM stats CROSS JOIN totals
), weights AS (
  SELECT d.doc_id, CAST(sum(d.c * l.llr6) AS BIGINT) AS weight_micro
  FROM dbc d JOIN llr l ON d.b = l.b
  WHERE NOT d.is_target
  GROUP BY d.doc_id
)
SELECT w.doc_id, doc.source, w.weight_micro
FROM weights w JOIN documents doc ON w.doc_id = doc.doc_id
ORDER BY w.weight_micro DESC, w.doc_id
LIMIT {DSIR_K}
"""


QUERIES = {
    "mixture_sample_docs": mixture_sample_docs,
    "temperature_mixture_sample": temperature_mixture_sample,
    "dsir_select_docs": dsir_select_docs,
}
ORACLES = {
    "mixture_sample_docs": MIXTURE_SQL,
    "temperature_mixture_sample": TEMPERATURE_SQL,
    "dsir_select_docs": DSIR_SQL,
}


# --------------------------------------------------------------------------
# top-p token-budget selection per source
# --------------------------------------------------------------------------

NUCLEUS_P_PCT = 80  # keep the best docs covering 80% of token mass


def nucleus_select_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget allocation by quality prefix — the
    corpus-curation analogue of nucleus (top-p) sampling: rank each
    source's documents by quality (word count as the stand-in scalar,
    tie → doc_id) and keep the minimal prefix whose cumulative token
    mass reaches P% of the source's total; the doc that crosses the
    threshold is included. Reports, per source, how many docs and
    tokens survive and the realized share — the knob a mixture
    pipeline tunes when a source's long tail is mostly noise.

    Integer discipline: the threshold test is the cross-product
    (cum_before · 100 < total · P), the realized share lands on the
    ppm grid with one truncating division. One shuffle to doc-grain
    words, a source-partitioned window, one agg."""
    from pyspark.sql import Window

    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(tokens("text")).cast("long").alias("nw")
    )
    w = Window.partitionBy("source").orderBy(F.desc("nw"), F.asc("doc_id"))
    wall = Window.partitionBy("source")
    staged = (
        docs.withColumn(
            "cum_before",
            F.coalesce(
                F.sum("nw").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("total", F.sum("nw").over(wall))
    )
    kept = staged.filter(
        F.col("cum_before") * 100 < F.col("total") * NUCLEUS_P_PCT
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs_kept"),
            F.sum("nw").cast("long").alias("tokens_kept"),
            F.first("total").cast("long").alias("tokens_total"),
        )
        .select(
            "source",
            "n_docs_kept",
            "tokens_kept",
            F.expr(
                "CAST(tokens_kept * 1000000 DIV tokens_total AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("source")
    )


from ..functions.text import tokens_sql as _tok_sql  # noqa: E402

NUCLEUS_SQL = f"""
WITH docs AS (
  SELECT source, doc_id,
         CAST(len({_tok_sql("text")}) AS BIGINT) AS nw
  FROM documents
), staged AS (
  SELECT source, doc_id, nw,
         coalesce(sum(nw) OVER (PARTITION BY source
                                ORDER BY nw DESC, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cum_before,
         sum(nw) OVER (PARTITION BY source) AS total
  FROM docs
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs_kept,
       CAST(sum(nw) AS BIGINT) AS tokens_kept,
       CAST(sum(nw) * 1000000 // CAST(max(total) AS BIGINT) AS BIGINT)
         AS share_ppm
FROM staged
WHERE cum_before * 100 < total * {NUCLEUS_P_PCT}
GROUP BY source
ORDER BY source
"""

QUERIES["nucleus_select_by_source"] = nucleus_select_by_source
ORACLES["nucleus_select_by_source"] = NUCLEUS_SQL


# --------------------------------------------------------------------------
# DoReMi-style domain reweighting: multiplicative weights over
# per-source excess loss
# --------------------------------------------------------------------------

MW_ROUNDS = 8
_MW_W0 = 1_000_000          # weights live on an integer ppm grid
_MW_ETA_DEN = 10_000_000    # factor = 1 + excess/1e7  (eta = 0.1/nat)


def domain_reweight_mw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting by MULTIPLICATIVE WEIGHTS over
    per-domain excess loss — the Group-DRO / DoReMi update (Sagawa et
    al. 2020 eq. 4; Xie et al. 2023 §3 step 2) with the per-domain
    loss proxied by mean unigram surprisal (micro-nat-exact, the
    doc_surprisal arithmetic aggregated per source instead of per
    doc).

    Update, all exact BIGINT (shared with the unrolled oracle):
      loss(s)   = Σ micro(s) DIV n_tokens(s)           [micro-nats]
      wmean_t   = Σ w_t·loss DIV Σ w_t
      raw_t(s)  = w_t(s) · max(1, 1e7 + (loss(s) − wmean_t))
      w_{t+1}(s)= raw_t(s) DIV (Σ raw_t DIV 1e6)       [ppm grid]
    so domains with above-average loss gain weight each round and the
    weights renormalize to ~1e6. Truncating integer division at every
    step is part of the pinned spec (both engines' DIV truncate
    identically on the positive operands used here); the max(1, ·)
    clamp makes the factor positive for ANY loss spread.

    Output: (round, source, loss_micro, weight_ppm) for rounds
    0..MW_ROUNDS — the whole trajectory gates, not just the fixed
    point, so a single-round arithmetic slip cannot hide.

    Scale: ONE corpus-grain pass (tokenize + vocab join) computes the
    per-source loss; the trajectory is arithmetic on the SOURCES-sized
    relation (20 rows here, hundreds in a real crawl), so it runs
    driver-side on the bounded-collect contract — the IVF-centroid /
    BPE-argmax driver-state pattern. Round-14 optimization (guide
    §1.2, §5.1): the previous shape kept the trajectory distributed,
    which cost 3 Spark jobs per MW round (weighted-mean broadcast,
    renorm-sum broadcast, localCheckpoint sever) × 8 rounds ≈ 24 tiny
    jobs on a 20-row relation — pure scheduler overhead at every
    scale, since the relation is sources-grain BY CONSTRUCTION. Now:
    one guarded collect of the per-source loss, the exact-integer MW
    recurrence in plain Python (BIGINT `div` on the all-positive
    operands here truncates exactly like Python `//`), and one
    createDataFrame of the full trajectory. The corpus-grain work is
    untouched and still dominates at scale.

    Reference: no counterpart (single-query exporter;
    repository/ParameterDataRepository.java:53-78); north-star
    LLM-data mixing surface beside mixture_sample_docs.
    """
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "source", tokens("text").alias("toks")
    )
    tok = docs.select(
        "source", F.explode("toks").alias("token")
    ).filter(F.col("token") != "")
    # Round-14 (guide §2.2, §3.4): pre-aggregate to (source, token)
    # grain BEFORE any join — the corpus is tokenized once instead of
    # three times (vocab agg, total agg, join probe side all re-read
    # `tok` otherwise), and the vocab join runs at (source x token)
    # grain instead of token-INSTANCE grain. Arithmetic is exact and
    # unchanged: micro(token) is constant per token, so
    # Σ_instances micro = Σ_tokens n_{s,token} · micro(token), and
    # n_tokens / n_tok / n_total are the same sums regrouped.
    st = (
        tok.groupBy("source", "token")
        .agg(F.count("*").alias("n"))
        .transform(track_cache)
    )
    vocab = st.groupBy("token").agg(F.sum("n").alias("n_tok"))
    total = st.agg(F.sum("n").alias("n_total"))
    micro = F.floor(
        F.log(F.col("n_total").cast("double") / F.col("n_tok").cast("double"))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    loss = (
        st.join(vocab, "token")
        .join(F.broadcast(total))
        .groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.sum(micro * F.col("n")).alias("sum_micro"),
        )
        .select(
            "source",
            F.expr("sum_micro div n_tokens").cast("long").alias("loss"),
        )
    )
    from ..session import collect_model_sized

    rows = collect_model_sized(
        loss, 100_000, "domain_reweight_mw per-source loss"
    )
    schema = "round int, source string, loss_micro long, weight_ppm long"
    if not rows:
        return spark.createDataFrame([], schema)
    srcs = sorted((r["source"], int(r["loss"])) for r in rows)
    n_src = len(srcs)
    # uniform init ON THE SHARE GRID (1e6 // n_sources each), so round
    # 0 lives on the same ppm-of-total scale every later round's
    # renormalization produces
    w = {s: _MW_W0 // n_src for s, _ in srcs}
    traj = [(0, s, ls, w[s]) for s, ls in srcs]
    for t in range(1, MW_ROUNDS + 1):
        wmean = sum(w[s] * ls for s, ls in srcs) // sum(w.values())
        raw = {s: w[s] * max(1, _MW_ETA_DEN + (ls - wmean)) for s, ls in srcs}
        sraw = sum(raw.values())
        w = {s: raw[s] // (sraw // _MW_W0) for s, _ in srcs}
        traj.extend((t, s, ls, w[s]) for s, ls in srcs)
    return spark.createDataFrame(traj, schema).orderBy("round", "source")


def _domain_reweight_sql(rounds: int = MW_ROUNDS) -> str:
    ctes = [
        f"""tok AS (
  SELECT source, unnest({tokens_sql("text")}) AS token FROM documents
),
tok_f AS (SELECT * FROM tok WHERE token <> ''),
vocab AS (SELECT token, count(*) AS n_tok FROM tok_f GROUP BY token),
total AS (SELECT count(*) AS n_total FROM tok_f),
loss AS MATERIALIZED (
  SELECT t.source,
         CAST(sum(CAST(floor(ln(CAST(tt.n_total AS DOUBLE)
                                / CAST(v.n_tok AS DOUBLE)) * 1e6 + 0.5)
                       AS BIGINT)) // count(*) AS BIGINT) AS loss
  FROM tok_f t JOIN vocab v ON t.token = v.token CROSS JOIN total tt
  GROUP BY t.source
),
w0 AS (SELECT source, loss,
             CAST({_MW_W0} // (SELECT count(*) FROM loss) AS BIGINT) AS w
      FROM loss)"""
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        ctes.append(
            f"""m{t} AS (
  SELECT CAST(sum(w * loss) // sum(w) AS BIGINT) AS wmean FROM w{p}
),
r{t} AS (
  SELECT source, loss,
         CAST(w * greatest(CAST(1 AS BIGINT),
                           {_MW_ETA_DEN} + (loss - (SELECT wmean FROM m{t})))
              AS BIGINT) AS raw
  FROM w{p}
),
s{t} AS (SELECT CAST(sum(raw) AS BIGINT) AS sraw FROM r{t}),
w{t} AS MATERIALIZED (
  SELECT source, loss,
         CAST(raw // ((SELECT sraw FROM s{t}) // {_MW_W0}) AS BIGINT) AS w
  FROM r{t}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS INTEGER) AS round, source,"
        f" loss AS loss_micro, w AS weight_ppm FROM w{t}"
        for t in range(rounds + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT * FROM ({union}) ORDER BY round, source"
    )


DOMAIN_REWEIGHT_SQL = _domain_reweight_sql()

QUERIES["domain_reweight_mw"] = domain_reweight_mw
ORACLES["domain_reweight_mw"] = DOMAIN_REWEIGHT_SQL
