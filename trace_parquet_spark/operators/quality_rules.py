"""Gopher-style rule-based document filtering: the battery of
hard-coded quality gates (Rae et al. 2021, "Scaling Language Models:
…Gopher", §A1.1) that LLM corpus pipelines run before any model-based
scoring — word-count bounds, mean-word-length band, symbol ratio,
minimum stopword evidence, and in-document repetition (top-bigram
share). Complements text_analysis.text_stats (raw metrics) and
corpus_pipeline (which gates on a single score): here each rule is a
driver-visible boolean column so downstream jobs can slice rejects by
failure mode.

Determinism: every ratio is a single division of two exactly-
representable integers, or an integer per-mille comparison — no
float accumulation anywhere, so the DuckDB oracle hash-matches.

Scale: one projection pass computes the character/token rules
(JVM-side, codegen); the repetition rule needs a per-doc bigram
aggregation — linear explode, groupBy (doc_id, gram) with partial
aggregation, then a per-doc max. The explode is the dominant cost and
is the same shape the dedup shingle pass already pays; at 100 TB the
two would share one materialized shingle relation.

Reference: no counterpart (single-query engine); north-star LLM-data
infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    norm_text_sql,
    shingles_from,
    shingles_sql,
    tokens,
    tokens_sql,
)
from ..sources.registry import load_table

MIN_WORDS, MAX_WORDS = 20, 100_000
MIN_MWL, MAX_MWL = 3, 10  # mean word length band
MAX_SYMBOL_MILLE = 100  # symbol chars <= 10% of characters
MIN_STOPWORDS = 2  # distinct stopwords required
MAX_TOP_BIGRAM_MILLE = 80  # top bigram <= 8% of bigrams


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rule flags plus the final pass verdict."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", tokens("text").alias("toks")
    )
    base = docs.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        F.aggregate(
            F.transform(F.col("toks"), lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_wlen"),
        F.length("text").cast("long").alias("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
        ).cast("long").alias("n_plain"),
        F.size(
            F.array_intersect(
                F.array_distinct("toks"),
                F.array(*[F.lit(s) for s in STOPWORDS]),
            )
        ).cast("long").alias("n_stop"),
    )
    bigrams = docs.select(
        "doc_id", F.explode(shingles_from(F.col("toks"), 2)).alias("g")
    )
    rep = (
        bigrams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").cast("long").alias("top_bigram"),
            F.sum("c").cast("long").alias("n_bigrams"),
        )
    )
    flags = base.join(rep, "doc_id").select(
        "doc_id",
        "n_words",
        ((F.col("n_words") >= MIN_WORDS) & (F.col("n_words") <= MAX_WORDS)).alias(
            "wc_ok"
        ),
        (
            (F.col("sum_wlen") >= MIN_MWL * F.col("n_words"))
            & (F.col("sum_wlen") <= MAX_MWL * F.col("n_words"))
        ).alias("mwl_ok"),
        (
            (F.col("n_chars") - F.col("n_plain")) * 1000
            <= F.lit(MAX_SYMBOL_MILLE) * F.col("n_chars")
        ).alias("sym_ok"),
        (F.col("n_stop") >= MIN_STOPWORDS).alias("stop_ok"),
        (
            F.col("top_bigram") * 1000
            <= F.lit(MAX_TOP_BIGRAM_MILLE) * F.col("n_bigrams")
        ).alias("rep_ok"),
    )
    return flags.select(
        "*",
        (
            F.col("wc_ok")
            & F.col("mwl_ok")
            & F.col("sym_ok")
            & F.col("stop_ok")
            & F.col("rep_ok")
        ).alias("passes"),
    ).orderBy("doc_id")


_STOP_LIST_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

GOPHER_SQL = f"""
WITH toks AS (
  SELECT doc_id, text, {tokens_sql("text")} AS t FROM documents
), base AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
           AS sum_wlen,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
              AS BIGINT) AS n_plain,
         CAST(len(list_intersect(list_distinct(t),
                                 [{_STOP_LIST_SQL}])) AS BIGINT) AS n_stop
  FROM toks
), bigrams AS (
  SELECT doc_id, unnest({shingles_sql("text", 2)}) AS g FROM documents
), rep AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram,
         CAST(sum(c) AS BIGINT) AS n_bigrams
  FROM (SELECT doc_id, g, count(*) AS c FROM bigrams GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT b.doc_id,
       b.n_words,
       b.n_words >= {MIN_WORDS} AND b.n_words <= {MAX_WORDS}     AS wc_ok,
       b.sum_wlen >= {MIN_MWL} * b.n_words
         AND b.sum_wlen <= {MAX_MWL} * b.n_words                 AS mwl_ok,
       (b.n_chars - b.n_plain) * 1000
         <= {MAX_SYMBOL_MILLE} * b.n_chars                       AS sym_ok,
       b.n_stop >= {MIN_STOPWORDS}                               AS stop_ok,
       r.top_bigram * 1000 <= {MAX_TOP_BIGRAM_MILLE} * r.n_bigrams AS rep_ok,
       (b.n_words >= {MIN_WORDS} AND b.n_words <= {MAX_WORDS})
         AND (b.sum_wlen >= {MIN_MWL} * b.n_words
              AND b.sum_wlen <= {MAX_MWL} * b.n_words)
         AND ((b.n_chars - b.n_plain) * 1000
              <= {MAX_SYMBOL_MILLE} * b.n_chars)
         AND (b.n_stop >= {MIN_STOPWORDS})
         AND (r.top_bigram * 1000
              <= {MAX_TOP_BIGRAM_MILLE} * r.n_bigrams)           AS passes
FROM base b JOIN rep r ON b.doc_id = r.doc_id
ORDER BY b.doc_id
"""


QUERIES = {"gopher_quality_flags": gopher_quality_flags}
ORACLES = {"gopher_quality_flags": GOPHER_SQL}


# --------------------------------------------------------------------------
# Distilling the rule battery into a linear model (round 13)
# --------------------------------------------------------------------------

PERC_ROUNDS = 6
_PERC_FEATS = ("n_words", "sum_wlen", "n_sym", "n_stop",
               "top_bigram", "n_bigrams")


def _quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-grain integer feature relation + the Gopher verdict as a
    +/-1 label — the exact flags gopher_quality_flags computes,
    collapsed to (y, x1..x6)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", tokens("text").alias("toks")
    )
    base = docs.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        F.aggregate(
            F.transform(F.col("toks"), lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_wlen"),
        F.length("text").cast("long").alias("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
        ).cast("long").alias("n_plain"),
        F.size(
            F.array_intersect(
                F.array_distinct("toks"),
                F.array(*[F.lit(s) for s in STOPWORDS]),
            )
        ).cast("long").alias("n_stop"),
    )
    bigrams = docs.select(
        "doc_id", F.explode(shingles_from(F.col("toks"), 2)).alias("g")
    )
    rep = (
        bigrams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").cast("long").alias("top_bigram"),
            F.sum("c").cast("long").alias("n_bigrams"),
        )
    )
    passes = (
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("n_words") <= MAX_WORDS)
        & (F.col("sum_wlen") >= MIN_MWL * F.col("n_words"))
        & (F.col("sum_wlen") <= MAX_MWL * F.col("n_words"))
        & (
            (F.col("n_chars") - F.col("n_plain")) * 1000
            <= F.lit(MAX_SYMBOL_MILLE) * F.col("n_chars")
        )
        & (F.col("n_stop") >= MIN_STOPWORDS)
        & (
            F.col("top_bigram") * 1000
            <= F.lit(MAX_TOP_BIGRAM_MILLE) * F.col("n_bigrams")
        )
    )
    return base.join(rep, "doc_id").select(
        "doc_id",
        F.when(passes, F.lit(1)).otherwise(F.lit(-1)).cast("long").alias("y"),
        "n_words",
        "sum_wlen",
        (F.col("n_chars") - F.col("n_plain")).alias("n_sym"),
        "n_stop",
        "top_bigram",
        "n_bigrams",
    )


def perceptron_distill_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-perceptron distillation of the Gopher rule battery into a
    linear model — the standard bootstrap for model-based quality
    filtering (a cheap linear scorer trained on rule labels, cf.
    CCNet/fasttext quality classifiers; perceptron per Rosenblatt
    1958, batch variant = one full-gradient step per round).

    Per round over the cached doc-grain feature relation: a document
    is a MISTAKE when y * (w . x) <= 0 under the CURRENT integer
    weights; the update adds the summed gradient of all mistakes,
    w += sum(y * x), so every weight stays an exact BIGINT and the
    whole trajectory is engine-independent — no learning rate, no
    float. Convergence is not required (the rule battery is not
    linearly separable in these six features); what the entry pins is
    the exact mistake-count trajectory and weight path.

    Scale: the feature relation is ONE corpus pass (the same explode +
    doc-grain aggregation gopher_quality_flags pays), cached at doc
    grain; each round is a single partial-aggregable filter+sum over
    it — PERC_ROUNDS linear agg passes, a 1-row collect per round
    (driver state = 7 integers, the IVF-centroid pattern). Weight
    magnitude is bounded by rounds * sum|x| — int64-safe through
    ~10^12 corpus tokens; past that, scale features down before
    training (documented cap, same discipline as the unigram
    trainer's).

    Output: one row per round — n_mistakes evaluated under the
    pre-update weights, then the post-update weight vector.
    """
    feats = _quality_features(spark, sf_dir)
    from ..session import collect_model_sized, track_cache

    feats = feats.transform(track_cache)
    w = [0] * (1 + len(_PERC_FEATS))
    out_rows: list[tuple] = []
    for r in range(PERC_ROUNDS):
        margin = F.lit(w[0]).cast("long")
        for j, c in enumerate(_PERC_FEATS):
            margin = margin + F.lit(w[j + 1]).cast("long") * F.col(c)
        mis = feats.filter((F.col("y") * margin) <= 0)
        agg = mis.agg(
            F.count("*").cast("long").alias("m"),
            F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("g0"),
            *[
                F.coalesce(F.sum(F.col("y") * F.col(c)), F.lit(0))
                .cast("long")
                .alias(f"g{j + 1}")
                for j, c in enumerate(_PERC_FEATS)
            ],
        )
        row = collect_model_sized(agg, 1, "perceptron round gradient")[0]
        w = [w[j] + row[f"g{j}"] for j in range(len(w))]
        out_rows.append((r + 1, int(row["m"]), *[int(x) for x in w]))
    schema = "round bigint, n_mistakes bigint, " + ", ".join(
        f"w{j} bigint" for j in range(len(w))
    )
    return spark.createDataFrame(out_rows, schema).orderBy("round")


def _perceptron_sql(rounds: int = PERC_ROUNDS) -> str:
    """Unrolled twin: feats CTE (the GOPHER_SQL base+rep relations),
    then per round a 1-row gradient aggregate g{r} under the weight
    table wt{r}, and wt{r+1} = wt{r} + g{r}."""
    xs = _PERC_FEATS
    feat_cte = f"""toks AS (
  SELECT doc_id, text, {tokens_sql("text")} AS t FROM documents
), base AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
           AS sum_wlen,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
              AS BIGINT) AS n_plain,
         CAST(len(list_intersect(list_distinct(t),
                                 [{_STOP_LIST_SQL}])) AS BIGINT) AS n_stop
  FROM toks
), bg AS (
  SELECT doc_id, unnest({shingles_sql("text", 2)}) AS g FROM documents
), rep AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram,
         CAST(sum(c) AS BIGINT) AS n_bigrams
  FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g)
  GROUP BY doc_id
), feats AS MATERIALIZED (
  SELECT CASE WHEN
           (b.n_words >= {MIN_WORDS} AND b.n_words <= {MAX_WORDS})
           AND (b.sum_wlen >= {MIN_MWL} * b.n_words
                AND b.sum_wlen <= {MAX_MWL} * b.n_words)
           AND ((b.n_chars - b.n_plain) * 1000
                <= {MAX_SYMBOL_MILLE} * b.n_chars)
           AND (b.n_stop >= {MIN_STOPWORDS})
           AND (r.top_bigram * 1000
                <= {MAX_TOP_BIGRAM_MILLE} * r.n_bigrams)
         THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
         b.n_words, b.sum_wlen,
         (b.n_chars - b.n_plain) AS n_sym, b.n_stop,
         r.top_bigram, r.n_bigrams
  FROM base b JOIN rep r ON b.doc_id = r.doc_id
),
wt0 AS (SELECT {", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(len(xs) + 1))})"""
    ctes = [feat_cte]
    for r in range(rounds):
        dot = " + ".join(
            [f"wt.w0"] + [f"wt.w{j + 1} * f.{c}" for j, c in enumerate(xs)]
        )
        gsel = ", ".join(
            [
                "CAST(count(*) AS BIGINT) AS m",
                "CAST(coalesce(sum(f.y), 0) AS BIGINT) AS g0",
            ]
            + [
                f"CAST(coalesce(sum(f.y * f.{c}), 0) AS BIGINT) AS g{j + 1}"
                for j, c in enumerate(xs)
            ]
        )
        ctes.append(
            f"""g{r} AS MATERIALIZED (
  SELECT {gsel}
  FROM feats f, wt{r} wt
  WHERE f.y * ({dot}) <= 0
)"""
        )
        wsel = ", ".join(
            f"wt.w{j} + g.g{j} AS w{j}" for j in range(len(xs) + 1)
        )
        ctes.append(
            f"wt{r + 1} AS MATERIALIZED (SELECT {wsel} FROM wt{r} wt, g{r} g)"
        )
    wcols = ", ".join(f"w{j}" for j in range(len(xs) + 1))
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r + 1} AS BIGINT) AS round, (SELECT m FROM g{r})"
        f" AS n_mistakes, {wcols} FROM wt{r + 1}"
        for r in range(rounds)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({union}) ORDER BY round"


PERCEPTRON_SQL = _perceptron_sql()

QUERIES["perceptron_distill_train"] = perceptron_distill_train
ORACLES["perceptron_distill_train"] = PERCEPTRON_SQL


# --------------------------------------------------------------------------
# Curriculum ordering from the rule battery
# --------------------------------------------------------------------------


def curriculum_order_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum training order (curriculum learning for LLM
    pretraining: highest-quality documents scheduled first, random
    within a quality band): score = the number of Gopher rules passed
    (0..5), phase = the score's cumulative-decile band, shuffle_key =
    the repo's deterministic md5-family hash for the within-phase
    shuffle. The TRAINING ORDER is (phase, shuffle_key, doc_id) —
    emitted as sort KEYS, never as a materialized global row_number:
    at 100 TB a total order exists only as a range-partitioned sort,
    and any doc-grain global window here would be the exact
    anti-pattern tools/window_audit.py exists to reject.

    Phase assignment is grid-scalable: the only window runs over the
    SCORE GRID (<= 6 rows — an aggregate, so the global-window audit
    passes structurally), phase(s) = floor(10 * |docs with strictly
    higher score| / total), i.e. the band's starting decile; ties
    share a phase by construction, and every division is integer.

    Reference: no counterpart (single-query exporter); north-star
    LLM-data scheduling surface beside epoch_shuffle_microbatches
    (which shuffles WITHIN a fixed epoch; this entry orders ACROSS
    quality bands).
    """
    from pyspark.sql import Window

    from ..functions.hashing import stable_hash32
    from ..session import track_cache

    flags = gopher_quality_flags(spark, sf_dir)
    scored = flags.select(
        "doc_id",
        (
            F.col("wc_ok").cast("int")
            + F.col("mwl_ok").cast("int")
            + F.col("sym_ok").cast("int")
            + F.col("stop_ok").cast("int")
            + F.col("rep_ok").cast("int")
        ).cast("long").alias("score"),
    ).transform(track_cache)
    grid = scored.groupBy("score").agg(F.count("*").alias("n"))
    better = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ph = grid.select(
        "score",
        F.coalesce(F.sum("n").over(better), F.lit(0)).alias("cum_better"),
    )
    tot = grid.agg(F.sum("n").alias("total"))
    phase = ph.crossJoin(F.broadcast(tot)).select(
        "score",
        F.expr("(cum_better * 10) div total").cast("long").alias("phase"),
    )
    return (
        scored.join(F.broadcast(phase), "score")
        .select(
            "doc_id",
            "score",
            "phase",
            stable_hash32(
                F.concat(F.lit("cur:"), F.col("doc_id").cast("string"))
            ).alias("shuffle_key"),
        )
        .orderBy("phase", "shuffle_key", "doc_id")
    )


def _curriculum_sql() -> str:
    from ..functions.hashing import stable_hash32_sql

    flag_exprs = f"""
  SELECT b.doc_id,
         CAST((CASE WHEN b.n_words >= {MIN_WORDS}
                     AND b.n_words <= {MAX_WORDS} THEN 1 ELSE 0 END)
            + (CASE WHEN b.sum_wlen >= {MIN_MWL} * b.n_words
                     AND b.sum_wlen <= {MAX_MWL} * b.n_words
               THEN 1 ELSE 0 END)
            + (CASE WHEN (b.n_chars - b.n_plain) * 1000
                         <= {MAX_SYMBOL_MILLE} * b.n_chars
               THEN 1 ELSE 0 END)
            + (CASE WHEN b.n_stop >= {MIN_STOPWORDS} THEN 1 ELSE 0 END)
            + (CASE WHEN r.top_bigram * 1000
                         <= {MAX_TOP_BIGRAM_MILLE} * r.n_bigrams
               THEN 1 ELSE 0 END) AS BIGINT) AS score
  FROM base b JOIN rep r ON b.doc_id = r.doc_id"""
    return f"""
WITH toks AS (
  SELECT doc_id, text, {tokens_sql("text")} AS t FROM documents
), base AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
           AS sum_wlen,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
              AS BIGINT) AS n_plain,
         CAST(len(list_intersect(list_distinct(t),
                                 [{_STOP_LIST_SQL}])) AS BIGINT) AS n_stop
  FROM toks
), bigrams AS (
  SELECT doc_id, unnest({shingles_sql("text", 2)}) AS g FROM documents
), rep AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram,
         CAST(sum(c) AS BIGINT) AS n_bigrams
  FROM (SELECT doc_id, g, count(*) AS c FROM bigrams GROUP BY doc_id, g)
  GROUP BY doc_id
), scored AS ({flag_exprs}
), grid AS (
  SELECT score, count(*) AS n FROM scored GROUP BY score
), ph AS (
  SELECT score,
         COALESCE(SUM(n) OVER (ORDER BY score DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0)
           AS cum_better
  FROM grid
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total FROM grid
), phase AS (
  SELECT score, CAST((cum_better * 10) // total AS BIGINT) AS phase
  FROM ph CROSS JOIN tot
)
SELECT s.doc_id, s.score, p.phase,
       {stable_hash32_sql("'cur:' || CAST(s.doc_id AS VARCHAR)")}
         AS shuffle_key
FROM scored s JOIN phase p ON s.score = p.score
ORDER BY p.phase, shuffle_key, s.doc_id
"""


CURRICULUM_SQL = _curriculum_sql()

QUERIES["curriculum_order_docs"] = curriculum_order_docs
ORACLES["curriculum_order_docs"] = CURRICULUM_SQL
