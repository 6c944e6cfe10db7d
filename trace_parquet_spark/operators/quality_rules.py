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
