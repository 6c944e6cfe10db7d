"""Corpus indexing primitives: document chunking and an inverted index.

- **chunk_documents**: fixed-size character chunking — the sharding
  step before embedding/tokenizer passes in a training pipeline (long
  docs become bounded units of work). Pure JVM expressions: the chunk
  spine is sequence+explode (rows ∝ total chars / chunk size, never
  driver-side), substring slices each chunk, and a content hash makes
  chunks addressable.
- **inverted_token_index**: token → sorted posting list of doc ids,
  df-bounded the same way the dedup shingle path is (a posting list
  for a stopword is megabytes of ids carrying no signal; the cap also
  bounds the collect_set state per group). Postings serialize to a
  '|'-joined string for flat cross-engine hashing (same rule as
  collect_aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash32, stable_hash32_sql
from ..functions.text import tokens, tokens_sql
from ..sources.registry import load_table, load_table_parallel

CHUNK_CHARS = 100
CHUNK_DOC_MAX = 50
# The synthetic corpus has a ~60-word vocabulary with df ≈ 0.8·N, so
# the cap sits high enough to keep the index meaningful on testdata;
# production would cap at a small df multiple of the expected posting
# fan-out (same reasoning as dedup.SHINGLE_DF_CAP).
POSTING_DF_MAX = 1000
POSTING_DF_MIN = 2


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < CHUNK_DOC_MAX) & (F.length("text") > 0)
    )
    n_chunks = F.ceil(F.length("text") / F.lit(CHUNK_CHARS)).cast("long")
    chunked = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.substring(
            F.col("text"),
            (F.col("chunk_idx") * CHUNK_CHARS + 1).cast("int"),
            CHUNK_CHARS,
        ).alias("chunk_text"),
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.length("chunk_text").cast("long").alias("chunk_len"),
        stable_hash32(F.col("chunk_text")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


CHUNK_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         CAST(ceil(length(text) / {CHUNK_CHARS}.0) AS BIGINT) AS n_chunks
  FROM documents
  WHERE doc_id < {CHUNK_DOC_MAX} AND length(text) > 0
),
chunked AS (
  SELECT doc_id,
         CAST(unnest(generate_series(0, n_chunks - 1)) AS BIGINT) AS chunk_idx,
         text
  FROM base
)
SELECT doc_id, chunk_idx,
       CAST(length(substring(text, CAST(chunk_idx * {CHUNK_CHARS} + 1 AS INT), {CHUNK_CHARS})) AS BIGINT) AS chunk_len,
       {stable_hash32_sql(f"substring(text, CAST(chunk_idx * {CHUNK_CHARS} + 1 AS INT), {CHUNK_CHARS})")} AS chunk_hash
FROM chunked
ORDER BY doc_id, chunk_idx
"""


def inverted_token_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = (
        load_table_parallel(spark, sf_dir, "documents", "doc_id")
        .select("doc_id", F.explode(tokens("text")).alias("t"))
        .filter(F.col("t") != "")
        .distinct()
    )
    return (
        tok.groupBy("t")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_set("doc_id")),
                    lambda x: x.cast("string"),
                ),
                "|",
            ).alias("postings"),
        )
        .filter(F.col("df").between(POSTING_DF_MIN, POSTING_DF_MAX))
        .select(F.col("t").alias("token"), "df", "postings")
        .orderBy("token")
    )


INVERTED_INDEX_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest({tokens_sql("text")}) AS t FROM documents
  ) WHERE t <> ''
)
SELECT t AS token,
       count(*) AS df,
       array_to_string(list_sort(list(doc_id)), '|') AS postings
FROM tok
GROUP BY t
HAVING count(*) BETWEEN {POSTING_DF_MIN} AND {POSTING_DF_MAX}
ORDER BY token
"""


QUERIES = {
    "chunk_documents": chunk_documents,
    "inverted_token_index": inverted_token_index,
}

ORACLES = {
    "chunk_documents": CHUNK_SQL,
    "inverted_token_index": INVERTED_INDEX_SQL,
}


# --------------------------------------------------------------------------
# postings-list compression accounting (Elias-gamma gap coding)
# --------------------------------------------------------------------------


def postings_compression_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Index-size accounting for the inverted index: per document-
    frequency band (binary bands: |bin(df)|), how many bits the
    postings cost raw (64 per doc id) vs delta-gap Elias-γ coded
    (γ(g) = 2·|bin(g)| − 1 bits) — the classic IR result that gap
    coding collapses dense lists. All integer: gaps come from a lag
    window inside each token's postings (first gap = doc_id + 1 so
    every gap is ≥ 1), bit lengths via length(bin(gap)) which both
    engines print minimally, savings on the exact ppm grid.

    Scale: one (doc, token) distinct shuffle, one lag window
    PARTITIONED by token (never global), and a band-grain aggregate —
    the output is ≤ |bin(n_docs)| rows."""
    tok = (
        load_table_parallel(spark, sf_dir, "documents", "doc_id")
        .select("doc_id", F.explode(tokens("text")).alias("t"))
        .filter(F.col("t") != "")
        .distinct()
    )
    w = Window.partitionBy("t").orderBy("doc_id")
    gaps = tok.select(
        "t",
        "doc_id",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(w),
            F.col("doc_id") + 1,
        ).alias("gap"),
    )
    per_token = gaps.groupBy("t").agg(
        F.count("*").alias("df"),
        F.sum(
            F.lit(2) * F.length(F.bin(F.col("gap"))) - F.lit(1)
        ).alias("gamma_bits"),
    )
    return (
        per_token.groupBy(
            F.length(F.bin(F.col("df"))).cast("long").alias("df_band")
        )
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("df").cast("long").alias("n_postings"),
            F.sum("gamma_bits").cast("long").alias("gamma_bits"),
            (F.sum("df") * 64).cast("long").alias("raw_bits"),
        )
        .select(
            "df_band",
            "n_tokens",
            "n_postings",
            "gamma_bits",
            "raw_bits",
            F.expr(
                "CAST((raw_bits - gamma_bits) * 1000000 div raw_bits "
                "AS BIGINT)"
            ).alias("savings_ppm"),
        )
        .orderBy("df_band")
    )


POSTINGS_COMPRESSION_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest({tokens_sql("text")}) AS t FROM documents
  ) WHERE t <> ''
), gaps AS (
  SELECT t, doc_id,
         COALESCE(doc_id - lag(doc_id) OVER (PARTITION BY t
                                             ORDER BY doc_id),
                  doc_id + 1) AS gap
  FROM tok
), per_token AS (
  SELECT t, count(*) AS df,
         sum(2 * length(bin(gap)) - 1) AS gamma_bits
  FROM gaps GROUP BY t
), banded AS (
  SELECT CAST(length(bin(df)) AS BIGINT) AS df_band,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(df) AS BIGINT) AS n_postings,
         CAST(sum(gamma_bits) AS BIGINT) AS gamma_bits,
         CAST(sum(df) * 64 AS BIGINT) AS raw_bits
  FROM per_token GROUP BY 1
)
SELECT df_band, n_tokens, n_postings, gamma_bits, raw_bits,
       CAST((raw_bits - gamma_bits) * 1000000 // raw_bits AS BIGINT)
         AS savings_ppm
FROM banded
ORDER BY df_band
"""

QUERIES["postings_compression_stats"] = postings_compression_stats
ORACLES["postings_compression_stats"] = POSTINGS_COMPRESSION_SQL
