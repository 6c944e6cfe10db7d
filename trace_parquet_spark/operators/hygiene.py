"""Training-data hygiene: benchmark decontamination and a
perplexity-proxy (unigram surprisal) quality score — the two checks a
corpus pipeline runs between dedup and sampling.

``decontaminate_docs``: flag corpus documents sharing any word n-gram
with a held-out eval set (here: every 50th doc_id stands in for the
benchmark). The canonical n-gram-overlap decontamination used for
LLM training corpora: eval n-grams are few, so they broadcast; the
corpus side explodes its shingles once and the match is an equi-join
on the gram string — no pairwise document comparison anywhere.

``doc_surprisal``: mean unigram surprisal ln(N/n_token) per document
against the corpus's own unigram model — low surprisal ≈ boilerplate,
high ≈ gibberish; both tails get cut in practice. Determinism across
engines: each token's surprisal is quantized to integer micro-nats
(floor(ln·1e6 + 0.5) — the libm-parity grid operators/prep.py uses
for PMI), summed exactly as BIGINT, and divided ONCE by n·1e6 with
both operands exactly representable, so the double result is
bit-identical in any IEEE engine.

Scale: the unigram model is one groupBy over exploded tokens (heavy
but linear, partial-agg); the per-doc pass re-joins tokens to the
vocabulary — a shuffle join keyed on the token, skew-safe because the
hottest tokens are stopwords whose join fan-out is bounded by doc
count, not squared. Eval grams stay broadcast-sized by construction
(benchmarks are tiny relative to a corpus).

Reference: no counterpart (single-query engine); north-star LLM-data
infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles_from, shingles_sql, tokens, tokens_sql
from ..sources.registry import load_table

EVAL_MOD = 50  # doc_id % EVAL_MOD == 0 -> held-out "benchmark" doc
NGRAM = 5


def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus docs contaminated by eval-set n-grams: one row per hit
    doc with how many distinct eval grams it contains and how many
    eval docs it collides with."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles_from(F.col("toks"), NGRAM))).alias(
            "gram"
        ),
    )
    eval_grams = grams.filter(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc"), "gram"
    )
    corpus_grams = grams.filter(F.col("doc_id") % EVAL_MOD != 0)
    return (
        corpus_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").cast("long").alias("n_hit_grams"),
            F.countDistinct("eval_doc").cast("long").alias("n_eval_docs"),
        )
        .orderBy("doc_id")
    )


DECONTAM_SQL = f"""
WITH grams AS (
  SELECT doc_id, unnest(list_distinct({shingles_sql("text", NGRAM)})) AS gram
  FROM documents
), eval_grams AS (
  SELECT doc_id AS eval_doc, gram FROM grams WHERE doc_id % {EVAL_MOD} = 0
), corpus_grams AS (
  SELECT doc_id, gram FROM grams WHERE doc_id % {EVAL_MOD} <> 0
)
SELECT c.doc_id,
       CAST(count(DISTINCT c.gram) AS BIGINT)    AS n_hit_grams,
       CAST(count(DISTINCT e.eval_doc) AS BIGINT) AS n_eval_docs
FROM corpus_grams c JOIN eval_grams e ON c.gram = e.gram
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


def doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram surprisal in micro-nat-exact
    arithmetic (see module docstring)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens("text").alias("toks")
    )
    tok = docs.select(
        "doc_id", "lang", F.explode("toks").alias("token")
    ).filter(F.col("token") != "")
    vocab = tok.groupBy("token").agg(F.count("*").alias("n_tok"))
    total = tok.agg(F.count("*").alias("n_total"))
    micro = F.floor(
        F.log(F.col("n_total").cast("double") / F.col("n_tok").cast("double"))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    return (
        tok.join(vocab, "token")
        .join(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(micro).alias("sum_micro"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            (
                F.col("sum_micro").cast("double")
                / (F.col("n_tokens") * F.lit(1_000_000)).cast("double")
            ).alias("avg_surprisal"),
        )
        .orderBy("doc_id")
    )


SURPRISAL_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({tokens_sql("text")}) AS token FROM documents
), tok_f AS (
  SELECT * FROM tok WHERE token <> ''
), vocab AS (
  SELECT token, count(*) AS n_tok FROM tok_f GROUP BY token
), total AS (
  SELECT count(*) AS n_total FROM tok_f
), per_tok AS (
  SELECT t.doc_id, t.lang,
         CAST(floor(ln(CAST(tt.n_total AS DOUBLE) / CAST(v.n_tok AS DOUBLE))
                    * 1e6 + 0.5) AS BIGINT) AS micro
  FROM tok_f t JOIN vocab v ON t.token = v.token CROSS JOIN total tt
)
SELECT doc_id, lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(micro) AS DOUBLE)
         / CAST(count(*) * 1000000 AS DOUBLE) AS avg_surprisal
FROM per_tok
GROUP BY doc_id, lang
ORDER BY doc_id
"""


def doc_surprisal_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean surprisal under an interpolated BIGRAM
    language model trained on the corpus itself — the perplexity-style
    quality filter (CCNet's KenLM gate) with the LM expressed as two
    count relations instead of an external model file.

    Model: P(w₂|w₁) = ½·c(w₁w₂)/c(w₁·) + ½·c(w₂)/N (even
    interpolation with the unigram model, so unseen-bigram positions
    stay finite without smoothing hyperparameters). Cross-engine
    exactness: P is ONE double division of two exact int64 products —
    (c_bi·N + c_uni·c_ctx) / (2·c_ctx·N) — and the ln is quantized to
    the 1e-6 micro-nat grid (the doc_surprisal/pmi libm-parity
    treatment). Products stay < 2⁶³ up to ~10⁹ corpus tokens; past
    that, scale the counts (divide both sides by a common 2ᵏ) before
    the division — the ratio, not the magnitudes, carries the signal.

    Bigrams come straight from each doc's token array (element_at is
    1-based in both engines); positions touching an empty token are
    dropped by the same rule on both sides. Plan: one bigram explode,
    three count aggregations (bigram / context / unigram), joins keyed
    on the bigram relation, one per-doc agg — every join is a hash
    join on token keys, nothing quadratic, no Python."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    bi = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(CASE WHEN size(toks) >= 2"
                    "           THEN sequence(1, size(toks) - 1)"
                    "           ELSE array() END,"
                    " i -> struct(element_at(toks, i) AS w1,"
                    "             element_at(toks, i + 1) AS w2))"
                )
            ).alias("g"),
        )
        .select("doc_id", "g.w1", "g.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    c_bi = bi.groupBy("w1", "w2").agg(F.count("*").alias("n_bi"))
    c_ctx = bi.groupBy("w1").agg(F.count("*").alias("n_ctx"))
    tok = docs.select(F.explode("toks").alias("token")).filter(
        F.col("token") != ""
    )
    c_uni = tok.groupBy("token").agg(F.count("*").alias("n_uni"))
    total = tok.agg(F.count("*").alias("n_total"))
    micro = F.floor(
        F.log(
            (2 * F.col("n_ctx") * F.col("n_total")).cast("double")
            / (
                F.col("n_bi") * F.col("n_total")
                + F.col("n_uni") * F.col("n_ctx")
            ).cast("double")
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    return (
        bi.join(c_bi, ["w1", "w2"])
        .join(c_ctx, "w1")
        .join(c_uni.withColumnRenamed("token", "w2"), "w2")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(micro).alias("sum_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (
                F.col("sum_micro").cast("double")
                / (F.col("n_bigrams") * F.lit(1_000_000)).cast("double")
            ).alias("avg_bigram_surprisal"),
        )
        .orderBy("doc_id")
    )


BIGRAM_SURPRISAL_SQL = f"""
WITH d AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
), bi AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM d, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
  WHERE toks[i] <> '' AND toks[i + 1] <> ''
), c_bi AS (
  SELECT w1, w2, count(*) AS n_bi FROM bi GROUP BY w1, w2
), c_ctx AS (
  SELECT w1, count(*) AS n_ctx FROM bi GROUP BY w1
), tok AS (
  SELECT unnest(toks) AS token FROM d
), tok_f AS (
  SELECT token FROM tok WHERE token <> ''
), c_uni AS (
  SELECT token, count(*) AS n_uni FROM tok_f GROUP BY token
), total AS (
  SELECT count(*) AS n_total FROM tok_f
), per_pos AS (
  SELECT b.doc_id,
         CAST(floor(ln(CAST(2 * x.n_ctx * tt.n_total AS DOUBLE)
                       / CAST(g.n_bi * tt.n_total + u.n_uni * x.n_ctx
                              AS DOUBLE))
                    * 1e6 + 0.5) AS BIGINT) AS micro
  FROM bi b
  JOIN c_bi g ON b.w1 = g.w1 AND b.w2 = g.w2
  JOIN c_ctx x ON b.w1 = x.w1
  JOIN c_uni u ON b.w2 = u.token
  CROSS JOIN total tt
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(micro) AS DOUBLE)
         / CAST(count(*) * 1000000 AS DOUBLE) AS avg_bigram_surprisal
FROM per_pos
GROUP BY doc_id
ORDER BY doc_id
"""


def ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail split (Wenzek et al. 2020): each
    language's documents are ranked by LM surprisal and cut into
    tertiles — 'head' (lowest surprisal, cleanest) is what CCNet
    keeps for pretraining, 'tail' gets dropped or downsampled. The LM
    here is the corpus's own unigram model (the doc_surprisal core),
    standing in for KenLM exactly as doc_surprisal_bigram documents.

    Cross-engine exactness: the per-doc ranking key is ONE double
    division of exact int64s (sum of micro-nat token surprisals /
    n_tokens·1e6 — bit-identical in any IEEE engine), and the tertile
    cuts are TYPE-1 quantiles (the VALUE at rank ceil(n/3), no
    interpolation), so bucket assignment (key ≤ cut, a value
    comparison) is deterministic in both engines regardless of tie
    order inside the rank window.

    Scale: per-doc surprisal is the linear token-join pipeline of
    doc_surprisal; ranking windows partition by LANGUAGE (never
    global); the cut relation is |langs|×2 rows, broadcast. At 100 TB
    the only heavy stages are the token explode + vocab join — both
    partial-agg/hash-join shapes. A WindowScaleHint fires when any
    language's doc count crosses the per-partition cliff, pointing at
    ccnet_quality_buckets_approx (the registered histogram twin)."""
    from .scale_hints import warn_if_window_heavy

    # the rank window below partitions by lang at DOC grain: the
    # parquet footer row count (driver-side, no Spark job) bounds any
    # per-language partition, so the exact docs-per-language probe
    # only runs once the table itself crosses the cliff
    warn_if_window_heavy(
        "ccnet_quality_buckets",
        "ccnet_quality_buckets_approx",
        df=load_table(spark, sf_dir, "documents").select("lang"),
        keys=["lang"],
        table_path=f"{sf_dir}/documents.parquet",
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens("text").alias("toks")
    )
    tok = docs.select(
        "doc_id", "lang", F.explode("toks").alias("token")
    ).filter(F.col("token") != "")
    vocab = tok.groupBy("token").agg(F.count("*").alias("n_tok"))
    total = tok.agg(F.count("*").alias("n_total"))
    micro = F.floor(
        F.log(F.col("n_total").cast("double") / F.col("n_tok").cast("double"))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    per_doc = (
        tok.join(vocab, "token")
        .join(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(micro).alias("sum_micro"),
        )
        .withColumn(
            "skey",
            F.col("sum_micro").cast("double")
            / (F.col("n_tokens") * F.lit(1_000_000)).cast("double"),
        )
    )
    from pyspark.sql import Window

    ranked = per_doc.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("lang").orderBy("skey", "doc_id")
        ),
    ).withColumn("nl", F.count("*").over(Window.partitionBy("lang")))
    cuts = ranked.groupBy("lang").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(F.col("nl") / F.lit(3.0)), F.col("skey"))
        ).alias("c1"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("nl") * 2 / F.lit(3.0)),
                F.col("skey"),
            )
        ).alias("c2"),
    )
    bucket = (
        F.when(F.col("skey") <= F.col("c1"), F.lit("head"))
        .when(F.col("skey") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        ranked.join(F.broadcast(cuts), "lang")
        .select("lang", bucket.alias("bucket"), "n_tokens", "skey")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.max("skey").alias("bucket_ceiling"),
        )
        .orderBy("lang", "bucket")
    )


CCNET_BUCKETS_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({tokens_sql("text")}) AS token FROM documents
), tok_f AS (
  SELECT * FROM tok WHERE token <> ''
), vocab AS (
  SELECT token, count(*) AS n_tok FROM tok_f GROUP BY token
), total AS (
  SELECT count(*) AS n_total FROM tok_f
), per_doc AS (
  SELECT t.doc_id, t.lang,
         CAST(count(*) AS BIGINT) AS n_tokens,
         sum(CAST(floor(ln(CAST(tt.n_total AS DOUBLE)
                           / CAST(v.n_tok AS DOUBLE)) * 1e6 + 0.5)
                  AS BIGINT)) AS sum_micro
  FROM tok_f t JOIN vocab v ON t.token = v.token CROSS JOIN total tt
  GROUP BY t.doc_id, t.lang
), keyed AS (
  SELECT doc_id, lang, n_tokens,
         CAST(sum_micro AS DOUBLE)
           / CAST(n_tokens * 1000000 AS DOUBLE) AS skey
  FROM per_doc
), ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS nl
  FROM keyed
), cuts AS (
  SELECT lang,
         max(CASE WHEN rn = CAST(ceil(nl / 3.0) AS BIGINT)
                  THEN skey END) AS c1,
         max(CASE WHEN rn = CAST(ceil(nl * 2 / 3.0) AS BIGINT)
                  THEN skey END) AS c2
  FROM ranked GROUP BY lang
)
SELECT r.lang,
       CASE WHEN r.skey <= c.c1 THEN 'head'
            WHEN r.skey <= c.c2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(r.n_tokens) AS BIGINT) AS total_tokens,
       max(r.skey) AS bucket_ceiling
FROM ranked r JOIN cuts c ON r.lang = c.lang
GROUP BY 1, 2
ORDER BY r.lang, bucket
"""


CC_CELLS = 256  # fixed per-language histogram grid for the approx cut


def ccnet_quality_buckets_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB twin of ccnet_quality_buckets: per-language tertile
    cuts from a MERGEABLE fixed-grid histogram instead of an exact
    per-language rank window (whose partition is data-sized and skewed
    by the dominant language at 100×). Same shape as
    equi_depth_price_buckets_approx (plans/analytics_more.py):

    - per-doc ranking key is an INTEGER — ``key_micro = sum_micro div
      n_tokens`` (average micro-nat token surprisal) — so every step
      AFTER the per-token micro value is int64-exact in both engines.
      The per-token value itself is ``floor(ln(n_total/n_tok)·1e6 +
      0.5)``, computed independently by JVM Math.log and DuckDB's
      libm: a 1-ulp ln difference exactly at a rounding boundary
      could in principle shift one doc by one cell (no such flip has
      been observed at either gate SF; everything downstream of the
      ln is integer, so it is the ONLY cross-engine divergence
      source);
    - per-language [min, max] bounds → CC_CELLS equi-width cells (one
      map-side-combinable agg);
    - cumulative cell mass via a broadcast theta self-join of the
      ≤ |langs|·CC_CELLS-row histogram (never a window);
    - cell → tertile from ``((cum_end - 1) * 3) div n_lang``;
    - docs get their bucket via a broadcast equi-join on (lang, cell).

    No stage sees a per-language data-sized partition: the heavy
    stages are the token explode + vocab join (linear, partial-agg)
    and two scans of the per-doc relation. Bucket sizes deviate from
    n/3 by at most one cell's mass; the exact rank-window version
    stays registered as the anchor. The DuckDB oracle recomputes the
    identical grid, so the gate checks value-level agreement of the
    approximation itself."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens("text").alias("toks")
    )
    tok = docs.select(
        "doc_id", "lang", F.explode("toks").alias("token")
    ).filter(F.col("token") != "")
    vocab = tok.groupBy("token").agg(F.count("*").alias("n_tok"))
    total = tok.agg(F.count("*").alias("n_total"))
    micro = F.floor(
        F.log(F.col("n_total").cast("double") / F.col("n_tok").cast("double"))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    per_doc = (
        tok.join(vocab, "token")
        .join(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(micro).alias("sum_micro"),
        )
        .withColumn("key_micro", F.expr("sum_micro div n_tokens"))
    )
    bounds = per_doc.groupBy("lang").agg(
        F.min("key_micro").alias("mn"),
        F.max("key_micro").alias("mx"),
    ).withColumn("width", F.expr(f"(mx - mn) div {CC_CELLS} + 1"))
    celled = per_doc.join(F.broadcast(bounds), "lang").select(
        "lang",
        "n_tokens",
        "key_micro",
        F.expr("(key_micro - mn) div width").alias("cell"),
    )
    hist = celled.groupBy("lang", "cell").agg(
        F.count("*").cast("long").alias("c")
    )
    h2 = hist.select(
        F.col("lang").alias("lang2"),
        F.col("cell").alias("cell2"),
        F.col("c").alias("c2"),
    )
    cum = (
        hist.join(
            F.broadcast(h2),
            (F.col("lang2") == F.col("lang"))
            & (F.col("cell2") <= F.col("cell")),
        )
        .groupBy("lang", "cell")
        .agg(F.sum("c2").alias("cum_end"))
    )
    nl = hist.groupBy("lang").agg(F.sum("c").alias("n_lang"))
    cell_bucket = cum.join(F.broadcast(nl), "lang").select(
        "lang",
        "cell",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            (F.expr("((cum_end - 1) * 3) div n_lang") + 1).cast("int"),
        ).alias("bucket"),
    )
    return (
        celled.join(F.broadcast(cell_bucket), ["lang", "cell"])
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.max("key_micro").cast("long").alias("ceiling_micro"),
        )
        .orderBy("lang", "bucket")
    )


CCNET_BUCKETS_APPROX_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({tokens_sql("text")}) AS token FROM documents
), tok_f AS (
  SELECT * FROM tok WHERE token <> ''
), vocab AS (
  SELECT token, count(*) AS n_tok FROM tok_f GROUP BY token
), total AS (
  SELECT count(*) AS n_total FROM tok_f
), per_doc AS (
  SELECT t.doc_id, t.lang,
         CAST(count(*) AS BIGINT) AS n_tokens,
         sum(CAST(floor(ln(CAST(tt.n_total AS DOUBLE)
                           / CAST(v.n_tok AS DOUBLE)) * 1e6 + 0.5)
                  AS BIGINT)) AS sum_micro
  FROM tok_f t JOIN vocab v ON t.token = v.token CROSS JOIN total tt
  GROUP BY t.doc_id, t.lang
), keyed AS (
  SELECT lang, n_tokens, sum_micro // n_tokens AS key_micro FROM per_doc
), bounds AS (
  SELECT lang, min(key_micro) AS mn,
         (max(key_micro) - min(key_micro)) // {CC_CELLS} + 1 AS width
  FROM keyed GROUP BY lang
), celled AS (
  SELECT k.lang, k.n_tokens, k.key_micro,
         (k.key_micro - b.mn) // b.width AS cell
  FROM keyed k JOIN bounds b ON k.lang = b.lang
), hist AS (
  SELECT lang, cell, CAST(count(*) AS BIGINT) AS c
  FROM celled GROUP BY lang, cell
), cum AS (
  SELECT h.lang, h.cell, CAST(sum(h2.c) AS BIGINT) AS cum_end
  FROM hist h JOIN hist h2 ON h2.lang = h.lang AND h2.cell <= h.cell
  GROUP BY h.lang, h.cell
), nl AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS n_lang FROM hist GROUP BY lang
), cell_bucket AS (
  SELECT c.lang, c.cell,
         CASE ((c.cum_end - 1) * 3) // n.n_lang
              WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM cum c JOIN nl n ON c.lang = n.lang
)
SELECT x.lang, b.bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(x.n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(x.key_micro) AS BIGINT) AS ceiling_micro
FROM celled x JOIN cell_bucket b ON x.lang = b.lang AND x.cell = b.cell
GROUP BY 1, 2
ORDER BY x.lang, b.bucket
"""


QUERIES = {
    "decontaminate_docs": decontaminate_docs,
    "doc_surprisal": doc_surprisal,
    "doc_surprisal_bigram": doc_surprisal_bigram,
    "ccnet_quality_buckets": ccnet_quality_buckets,
    "ccnet_quality_buckets_approx": ccnet_quality_buckets_approx,
}

ORACLES = {
    "decontaminate_docs": DECONTAM_SQL,
    "doc_surprisal": SURPRISAL_SQL,
    "doc_surprisal_bigram": BIGRAM_SURPRISAL_SQL,
    "ccnet_quality_buckets": CCNET_BUCKETS_SQL,
    "ccnet_quality_buckets_approx": CCNET_BUCKETS_APPROX_SQL,
}


def compression_ratio_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio — the CCNet/RedPajama-style
    boilerplate detector: highly compressible text (ratio << 1 per
    byte of input) is repetitive template content, incompressible text
    is noise/binary; both tails get filtered. Reuses the faithful
    core's deterministic gzip UDF (functions/gzip_codec.py, mtime=0),
    so the score is reproducible across runs and machines.

    Ratio as integer per-mille of compressed/original bytes — no float
    accumulation. The exact byte counts / CRCs have no DuckDB twin, so
    this detail is pytest-pinned golden (tests/test_round4.py) and the
    registry entry below gates the oracle-derivable evidence instead.

    Scale: pure map — one Arrow-batched pass, no shuffle at all; the
    final sort is the presentation ORDER BY.
    """
    from ..functions.gzip_codec import gzip_compress

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.select(
            "doc_id",
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.octet_length(gzip_compress(F.col("text")))
            .cast("long")
            .alias("n_gz_bytes"),
            # in-row golden evidence: CRC32 of the exact gzip bytes.
            # pytest recompresses with Python zlib (same mtime=0
            # determinism) and matches byte length AND checksum, so a
            # sampled rows-only record carries its own acceptance bar.
            F.crc32(gzip_compress(F.col("text"))).cast("long").alias("gz_crc32"),
        )
        .filter(F.col("n_bytes") > 0)
        .select(
            "doc_id",
            "n_bytes",
            "n_gz_bytes",
            "gz_crc32",
            F.expr("(n_gz_bytes * 1000) div n_bytes").alias("ratio_mille"),
        )
        .orderBy("doc_id")
    )


def compression_ratio_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gateable form of the zlib boilerplate detector: DuckDB
    has no SQL gzip, so the gated columns are the per-row evidence the
    oracle CAN predict — byte length plus two self-check flags.
    ``roundtrip_ok`` proves the codec lossless per row (gunzip ∘ gzip
    is identity); ``gz_bounded`` proves the compressed size obeys the
    DEFLATE worst-case envelope (18-byte header/trailer + 5 bytes per
    64 KiB stored block). A codec regression flips a flag to 0 and the
    hash gate catches it; the exact byte counts / ratios / CRCs stay
    pytest-pinned via compression_ratio_detail (round-6 verdict
    item 1)."""
    from ..functions.gzip_codec import gunzip_utf8, gzip_compress

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    gz = gzip_compress(F.col("text"))
    return (
        docs.filter(F.octet_length("text") > 0)
        .select(
            "doc_id",
            F.octet_length("text").cast("long").alias("n_bytes"),
            (gunzip_utf8(gz) == F.col("text")).cast("long").alias(
                "roundtrip_ok"
            ),
            (
                (F.octet_length(gz) > F.lit(18))
                & (
                    F.octet_length(gz)
                    <= F.octet_length("text")
                    + F.lit(64)
                    + (F.octet_length("text") / F.lit(1000)).cast("int")
                )
            )
            .cast("long")
            .alias("gz_bounded"),
        )
        .orderBy("doc_id")
    )


COMPRESSION_RATIO_SQL = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(1 AS BIGINT) AS roundtrip_ok,
       CAST(1 AS BIGINT) AS gz_bounded
FROM documents
WHERE strlen(text) > 0
ORDER BY doc_id
"""

QUERIES["compression_ratio_docs"] = compression_ratio_docs
ORACLES["compression_ratio_docs"] = COMPRESSION_RATIO_SQL


# --------------------------------------------------------------------------
# Kneser-Ney smoothed bigram model (Chen & Goodman 1999) — round 13
# --------------------------------------------------------------------------

KN_TOPK = 50
_KN_D_NUM, _KN_D_DEN = 3, 4  # absolute discount d = 3/4 (rational!)


def kneser_ney_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the standard LM
    smoothing (Chen & Goodman 1999 §3; Kneser & Ney 1995), next to
    the even-interpolation stand-in ``doc_surprisal_bigram`` uses.
    KN's signature move is the CONTINUATION distribution: the backoff
    mass for word w2 is proportional to how many distinct contexts w2
    follows (N1+(.w2)), not its raw frequency — "Francisco" is
    frequent but only ever follows "San", so its continuation
    probability is tiny. With absolute discount d:

        P(w2|w1) = (c(w1w2) - d)/c(w1)
                 + d * N1+(w1.)/c(w1) * N1+(.w2)/N1+(..)

    Cross-engine exactness: d = 3/4 keeps everything RATIONAL.
    Multiplying through by 4 gives the exact integer form

        pkn_ppm = ((4*c12 - 3)*T + 3*N1fw*Ncont) * 1e6
                  div (4*c1*T)

    (T = distinct bigram types) — pure BIGINT arithmetic, no float
    anywhere, so the top-k ranking is engine-independent. Every
    output bigram is observed (c12 >= 1 > d), so the max(c-d, 0)
    clamp never binds.

    Plan shape: one bigram explode from the per-doc token arrays,
    then THREE aggregations of the bigram-type relation (c_ctx and
    the continuation counts aggregate c_bi, which is already
    type-grain — vocab-sized, NOT corpus-sized), one broadcast of the
    1-row type total, and a TakeOrdered top-k. The only corpus-grain
    shuffle is the first groupBy(w1, w2); everything after is
    vocab-grain. At 100 TB: linear scan + partial-agg, no skew
    hazard beyond the stopword head that partial aggregation absorbs
    map-side. (Reference: no counterpart — north-star LLM-data
    surface; model quality smoothing for the CCNet-style filters
    above.)

    Output: the KN_TOPK most probable bigrams — w1, w2, raw count,
    exact pkn_ppm — ordered by pkn_ppm desc, then (w1, w2).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    bi = (
        docs.select(
            F.explode(
                F.expr(
                    "transform(CASE WHEN size(toks) >= 2"
                    "           THEN sequence(1, size(toks) - 1)"
                    "           ELSE array() END,"
                    " i -> struct(element_at(toks, i) AS w1,"
                    "             element_at(toks, i + 1) AS w2))"
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    c_bi = bi.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c12"))
    # history stats are aggregates of the TYPE relation: c1 recovers
    # the token count as sum(c12), n1fw is the distinct-successor count
    c_ctx = c_bi.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n1fw"),
    )
    cont = c_bi.groupBy("w2").agg(F.count("*").cast("long").alias("ncont"))
    types = c_bi.agg(F.count("*").cast("long").alias("t"))
    return (
        c_bi.join(c_ctx, "w1")
        .join(cont, "w2")
        .join(F.broadcast(types))
        .select(
            "w1",
            "w2",
            "c12",
            F.expr(
                f"CAST(((({_KN_D_DEN}*c12 - {_KN_D_NUM})*t"
                f" + {_KN_D_NUM}*n1fw*ncont) * 1000000)"
                f" DIV ({_KN_D_DEN}*c1*t) AS BIGINT)"
            ).alias("pkn_ppm"),
        )
        .orderBy(F.desc("pkn_ppm"), "w1", "w2")
        .limit(KN_TOPK)
    )


KNESER_NEY_SQL = f"""
WITH d AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
), bi AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM d, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
  WHERE toks[i] <> '' AND toks[i + 1] <> ''
), c_bi AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bi GROUP BY w1, w2
), c_ctx AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n1fw
  FROM c_bi GROUP BY w1
), cont AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS ncont FROM c_bi GROUP BY w2
), types AS (
  SELECT CAST(count(*) AS BIGINT) AS t FROM c_bi
)
SELECT b.w1, b.w2, b.c12,
       CAST(((({_KN_D_DEN}*b.c12 - {_KN_D_NUM})*tt.t
              + {_KN_D_NUM}*x.n1fw*c.ncont) * 1000000)
            // ({_KN_D_DEN}*x.c1*tt.t) AS BIGINT) AS pkn_ppm
FROM c_bi b
JOIN c_ctx x ON b.w1 = x.w1
JOIN cont c ON b.w2 = c.w2
CROSS JOIN types tt
ORDER BY pkn_ppm DESC, b.w1, b.w2
LIMIT {KN_TOPK}
"""

QUERIES["kneser_ney_bigram_topk"] = kneser_ney_bigram_topk
ORACLES["kneser_ney_bigram_topk"] = KNESER_NEY_SQL
