"""Composite training-data prep pipeline over ``documents``.

The end-to-end shape a 100 TB corpus pass takes, as ONE declarative
plan (each stage reuses the engine's operators, Catalyst fuses them):

1. quality gate   — drop low-quality docs (quality_score < τq);
2. exact dedup    — keep the min doc_id per content fingerprint;
3. near-dup sweep — among surviving docs, drop the higher-id member of
   every Jaccard-≥-τj pair (greedy by id, the standard corpus rule);
4. emit the clean corpus with its features.

Stage 3 reuses the exact n-gram pair relation; swapping in the
banded-LSH candidate generator (dedup.dedup_minhash_lsh) is a
one-line change and the scale default — exact pairs keep the oracle
fully SQL-expressible here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import fingerprint_md5, fingerprint_md5_sql
from ..functions.text import (
    norm_text,
    norm_text_sql,
    quality_score_from,
    quality_score_sql,
    token_count_from,
    token_count_sql,
    tokens,
)
from ..sources.registry import load_table_parallel
from .dedup import DEDUP_NGRAM_SQL, JACCARD_THRESHOLD, dedup_ngram_pairs

QUALITY_MIN = 0.5


def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    staged = docs.select("doc_id", "lang", "text", tokens("text").alias("toks"))
    featured = staged.select(
        "doc_id",
        "lang",
        token_count_from("text", F.col("toks")).alias("n_tokens"),
        quality_score_from("text", F.col("toks")).alias("quality"),
        fingerprint_md5(norm_text("text")).alias("content_fp"),
    )
    quality_ok = featured.filter(F.col("quality") >= QUALITY_MIN)

    exact_keep = quality_ok.groupBy("content_fp").agg(
        F.min("doc_id").alias("doc_id")
    )
    survivors = quality_ok.join(exact_keep, ["content_fp", "doc_id"], "inner")

    near_pairs = dedup_ngram_pairs(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    )
    cleaned = survivors.join(near_pairs, "doc_id", "left_anti")

    return cleaned.select(
        "doc_id", "lang", "n_tokens", F.round("quality", 6).alias("quality")
    ).orderBy("doc_id")


# The near-dup pair subquery is the body of DEDUP_NGRAM_SQL minus its
# ORDER BY (DuckDB CTEs reject a trailing order-by-in-subquery anyway).
_PAIRS_SQL = DEDUP_NGRAM_SQL.rsplit("ORDER BY", 1)[0]

CORPUS_CLEAN_SQL = f"""
WITH featured AS (
  SELECT doc_id, lang,
         {token_count_sql("text")}   AS n_tokens,
         {quality_score_sql("text")} AS quality,
         {fingerprint_md5_sql(norm_text_sql("text"))} AS content_fp
  FROM documents
),
quality_ok AS (SELECT * FROM featured WHERE quality >= {QUALITY_MIN}),
exact_keep AS (
  SELECT content_fp, min(doc_id) AS doc_id FROM quality_ok GROUP BY 1
),
survivors AS (
  SELECT q.* FROM quality_ok q
  JOIN exact_keep k ON q.content_fp = k.content_fp AND q.doc_id = k.doc_id
),
near_pairs AS (
  {_PAIRS_SQL}
)
SELECT s.doc_id, s.lang, s.n_tokens, round(s.quality, 6) AS quality
FROM survivors s
WHERE NOT EXISTS (SELECT 1 FROM near_pairs p WHERE p.doc_b = s.doc_id)
ORDER BY s.doc_id
"""


QUERIES = {"corpus_clean": corpus_clean}
ORACLES = {"corpus_clean": CORPUS_CLEAN_SQL}
