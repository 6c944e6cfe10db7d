"""Per-source dataset-card statistics — the "datasheet" a corpus
release ships with, computed in one pass.

For every ``source`` in the documents table: document and token
volume (the same RE2-portable BPE pre-tokenizer as
token_budget_by_source, so budgets line up across reports), character
volume, language spread, English share, and the exact-duplicate rate
(docs minus distinct content fingerprints — the md5 family shared
with dedup_exact, so the card's dup count reconciles with the dedup
stage's output by construction).

Shape: one scan, one hash aggregation keyed on source; the distinct
fingerprint count rides the same aggregation (Spark plans
count(DISTINCT) as a two-phase partial-distinct aggregate, no second
scan). Everything is an exact integer — no float rounding rules.

Reference: no counterpart (single-query export engine); north-star
LLM-data-pipeline extension alongside operators/text_analysis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import fingerprint_md5, fingerprint_md5_sql
from ..functions.text import norm_text, norm_text_sql
from ..sources.registry import load_table_parallel
from .text_analysis import BPE_PIECE_RE, BPE_PIECE_RE_DUCK


def dataset_card_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id").select(
        "source",
        "lang",
        F.size(F.regexp_extract_all("text", F.lit(BPE_PIECE_RE), F.lit(0)))
        .cast("long")
        .alias("n_tok"),
        F.length("text").cast("long").alias("n_chars"),
        fingerprint_md5(norm_text("text")).alias("fp"),
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum((F.col("lang") == "en").cast("long"))
            .cast("long")
            .alias("n_english"),
            (F.count("*") - F.countDistinct("fp"))
            .cast("long")
            .alias("n_exact_dup_docs"),
        )
        .orderBy("source")
    )


DATASET_CARD_SQL = f"""
WITH d AS (
  SELECT source, lang,
         CAST(len(regexp_extract_all(text, '{BPE_PIECE_RE_DUCK}')) AS BIGINT)
           AS n_tok,
         CAST(length(text) AS BIGINT) AS n_chars,
         {fingerprint_md5_sql(norm_text_sql("text"))} AS fp
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT)                 AS n_docs,
       CAST(sum(n_tok) AS BIGINT)               AS n_tokens,
       CAST(sum(n_chars) AS BIGINT)             AS n_chars,
       CAST(count(DISTINCT lang) AS BIGINT)     AS n_langs,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_english,
       CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dup_docs
FROM d
GROUP BY source
ORDER BY source
"""


QUERIES = {"dataset_card_by_source": dataset_card_by_source}
ORACLES = {"dataset_card_by_source": DATASET_CARD_SQL}
