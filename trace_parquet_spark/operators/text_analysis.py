"""Text analysis over the ``documents`` table.

Language ID, quality scoring, token counting, and document
fingerprinting — the per-document text featurization stage of a
training-data pipeline. Everything is built-in Spark SQL functions
(column builders in ``functions/text.py``) — zero Python in the hot
path, so the stage is embarrassingly parallel over document
partitions at 100 TB; the DuckDB oracles are generated from the same
builders' ``*_sql`` twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import (
    fingerprint_md5,
    fingerprint_md5_sql,
    stable_hash32,
    stable_hash32_sql,
)
from ..functions.text import (
    alpha_ratio,
    alpha_ratio_sql,
    lang_id_from,
    lang_id_sql,
    norm_text,
    norm_text_sql,
    quality_score_from,
    quality_score_sql,
    stopword_ratio_from,
    stopword_ratio_sql,
    token_count_from,
    token_count_sql,
    tokens,
    tokens_sql,
)
from ..sources.registry import load_table, load_table_parallel

_ROLLING_MOD = 2**31


def rolling_hash(col) -> "F.Column":
    """Order-sensitive Karp-Rabin-style fingerprint over the token
    stream: fold (acc*31 + h32(token)) mod 2^31. Unlike the md5 content
    hash this survives into substring/window-dedup variants."""
    hashes = F.transform(tokens(col), lambda t: stable_hash32(t))
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % F.lit(_ROLLING_MOD),
    )


def rolling_hash_sql(expr: str) -> str:
    h = f"list_transform({tokens_sql(expr)}, t -> {stable_hash32_sql('t')})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {h}), "
        f"(a, b) -> (a * 31 + b) % {_ROLLING_MOD})"
    )


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    staged = docs.select("doc_id", "text", tokens("text").alias("toks"))
    return staged.select(
        "doc_id",
        token_count_from("text", F.col("toks")).alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_raw"),
        F.round(alpha_ratio("text"), 6).alias("alpha_ratio"),
        F.round(stopword_ratio_from(F.col("toks")), 6).alias("stopword_ratio"),
        quality_score_from("text", F.col("toks")).alias("quality"),
    ).orderBy("doc_id")


TEXT_STATS_SQL = f"""
SELECT doc_id,
       {token_count_sql("text")}                    AS n_tokens,
       CAST(length(text) AS BIGINT)                 AS n_chars_raw,
       round({alpha_ratio_sql("text")}, 6)          AS alpha_ratio,
       round({stopword_ratio_sql("text")}, 6)       AS stopword_ratio,
       {quality_score_sql("text")}                  AS quality
FROM documents
ORDER BY doc_id
"""


def lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    staged = docs.select("text", tokens("text").alias("toks"))
    return (
        staged.select(lang_id_from("text", F.col("toks")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang_pred")
    )


LANG_ID_SQL = f"""
SELECT {lang_id_sql("text")} AS lang_pred, count(*) AS n_docs
FROM documents
GROUP BY 1
ORDER BY lang_pred
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content (md5-of-normalized) + order-sensitive rolling hashes."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select(
        "doc_id",
        fingerprint_md5(norm_text("text")).alias("content_fp"),
        rolling_hash("text").alias("rolling_fp"),
    ).orderBy("doc_id")


DOC_FINGERPRINTS_SQL = f"""
SELECT doc_id,
       {fingerprint_md5_sql(norm_text_sql("text"))} AS content_fp,
       {rolling_hash_sql("text")}                   AS rolling_fp
FROM documents
ORDER BY doc_id
"""


QUERIES = {
    "text_stats": text_stats,
    "lang_id_counts": lang_id_counts,
    "doc_fingerprints": doc_fingerprints,
}

ORACLES = {
    "text_stats": TEXT_STATS_SQL,
    "lang_id_counts": LANG_ID_SQL,
    "doc_fingerprints": DOC_FINGERPRINTS_SQL,
}


# GPT-2-style pre-tokenizer, restricted to lookaround-free syntax so
# Java regex (Spark) and RE2 (DuckDB) agree piece-for-piece: optional
# leading space + letter run | digit run | symbol run. (The real GPT-2
# pattern's \s+(?!\S) tail needs negative lookahead, which RE2 lacks;
# whitespace runs are dropped here instead of kept as tokens.)
BPE_PIECE_RE = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\n\\r]+"
BPE_PIECE_RE_DUCK = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n\r]+"


def token_budget_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source — the report a training run
    budgets against: docs, bytes, whitespace tokens, and BPE-style
    pre-tokenizer pieces (the count that tracks real tokenizer cost
    within a few percent, since BPE only ever splits within pieces).

    Scale: one projection (two regexp passes per doc, codegen) + one
    partial-agg shuffle keyed by source.
    """
    from ..functions.text import token_count_from, tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", tokens("text").alias("toks")
    )
    per_doc = docs.select(
        "source",
        F.octet_length("text").cast("long").alias("n_bytes"),
        token_count_from("text", F.col("toks")).cast("long").alias("n_ws"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PIECE_RE), F.lit(0)))
        .cast("long")
        .alias("n_bpe"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("n_ws").alias("total_ws_tokens"),
            F.sum("n_bpe").alias("total_bpe_pieces"),
        )
        .orderBy("source")
    )


TOKEN_BUDGET_SQL = f"""
WITH per_doc AS (
  SELECT source,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST({token_count_sql("text")} AS BIGINT)  AS n_ws,
         CAST(len(regexp_extract_all(text, '{BPE_PIECE_RE_DUCK}'))
              AS BIGINT)                            AS n_bpe
  FROM documents
)
SELECT source,
       count(*)                         AS n_docs,
       CAST(sum(n_bytes) AS BIGINT)     AS total_bytes,
       CAST(sum(n_ws) AS BIGINT)        AS total_ws_tokens,
       CAST(sum(n_bpe) AS BIGINT)       AS total_bpe_pieces
FROM per_doc
GROUP BY source
ORDER BY source
"""

QUERIES["token_budget_by_source"] = token_budget_by_source
ORACLES["token_budget_by_source"] = TOKEN_BUDGET_SQL
