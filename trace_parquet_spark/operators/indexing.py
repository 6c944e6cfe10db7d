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

from pyspark.sql import DataFrame, SparkSession
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
