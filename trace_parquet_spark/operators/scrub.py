"""Corpus scrubbing and chunking: PII redaction, sliding-window
chunking, and tokenizer fertility — the last-mile text transforms a
100 TB training-data pipeline runs between dedup/quality and the
trainer (or a RAG indexer).

All three are single-pass JVM plans (regexp/generator expressions
inside whole-stage codegen — no Python stage, no shuffle before the
final aggregate/sort) with full DuckDB oracles:

- ``pii_scrub_docs``: multi-category PII redaction (emails → [EMAIL],
  IPv4 → [IP], long digit runs → [NUM]) with per-category counts and
  an md5 over the scrubbed text. Categories are applied in a FIXED
  order on progressively redacted text, so counts are well-defined
  (an address inside an email is counted once, as the email). The
  synthetic corpus carries no PII, so both engines append the same
  deterministic doc_id-derived contact line first — the oracle then
  certifies regex semantics + replacement order cross-engine on
  nonzero counts. Patterns deliberately use the regex subset where
  Java (Spark) and RE2 (DuckDB) agree: literal classes, bounded
  repetition, \\b — no backrefs, no lookaround.
- ``chunk_documents_overlap``: fixed-width SLIDING-WINDOW chunks
  (CHUNK_W chars, stride CHUNK_S — overlapping, unlike
  indexing.chunk_documents' disjoint shards) via sequence+explode —
  the RAG / long-context packing primitive. Start offsets are a generator
  expression evaluated per row (no join, no shuffle); chunk text
  never leaves the projection that hashes it, so the operator ships
  (doc_id, chunk_id, start, len, md5) — bytes stay on the executor.
- ``tokenizer_fertility_by_source``: chars-per-token and
  bytes-per-token by source on the integer micro grid — the
  tokenizer-efficiency screen run before committing a vocab to a
  training mix (fertility regressions are a classic silent data bug).

Scale: pii/chunk are map-only until their final order/agg;
fertility is one partial-agg shuffle to |sources| rows.

Reference: no counterpart (single-query trace-export engine);
north-star LLM-pipeline extensions per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_count_from, tokens, tokens_sql
from ..sources.registry import load_table, load_table_parallel

QUERIES: dict = {}
ORACLES: dict = {}

# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

# Java-regex and RE2 agree on this subset (no backrefs/lookaround).
_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_RE_LONGNUM = r"\d{6,}"


def _augmented_text() -> F.Column:
    """documents.text plus a deterministic doc_id-derived contact line
    (the synthetic corpus has no PII): email on doc_id%3>0, IPv4 on
    even doc_id, an account number always — so the three counters take
    several distinct values across the corpus."""
    email = F.when(
        F.col("doc_id") % 3 > 0,
        F.concat(
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@mail-"),
            F.col("doc_id") % 7,
            F.lit(".example.com"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit(" from 10."),
            F.col("doc_id") % 256,
            F.lit("."),
            F.col("doc_id") % 16,
            F.lit("."),
            F.col("doc_id") % 100,
        ),
    ).otherwise(F.lit(""))
    acct = F.concat(F.lit(" acct "), F.lit(10_000_000) + F.col("doc_id"))
    return F.concat(F.col("text"), email, ip, acct)


def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    aug = _augmented_text()
    after_email = F.regexp_replace(aug, _RE_EMAIL, "[EMAIL]")
    after_ip = F.regexp_replace(after_email, _RE_IPV4, "[IP]")
    clean = F.regexp_replace(after_ip, _RE_LONGNUM, "[NUM]")
    return (
        docs.select(
            "doc_id",
            "source",
            F.regexp_count(aug, F.lit(_RE_EMAIL)).cast("long").alias("n_emails"),
            F.regexp_count(after_email, F.lit(_RE_IPV4))
            .cast("long")
            .alias("n_ips"),
            F.regexp_count(after_ip, F.lit(_RE_LONGNUM))
            .cast("long")
            .alias("n_longnums"),
            F.length(clean).cast("long").alias("clean_len"),
            F.md5(clean.cast("binary")).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


_AUG_SQL = """
  text
  || CASE WHEN doc_id % 3 > 0
       THEN ' contact user' || doc_id || '@mail-' || (doc_id % 7) || '.example.com'
       ELSE '' END
  || CASE WHEN doc_id % 2 = 0
       THEN ' from 10.' || (doc_id % 256) || '.' || (doc_id % 16) || '.' || (doc_id % 100)
       ELSE '' END
  || ' acct ' || (10000000 + doc_id)
"""

PII_SQL = rf"""
WITH aug AS (
  SELECT doc_id, source, {_AUG_SQL} AS t FROM documents
), s1 AS (
  SELECT doc_id, source, t,
         regexp_replace(t, '{_RE_EMAIL}', '[EMAIL]', 'g') AS t1
  FROM aug
), s2 AS (
  SELECT doc_id, source, t, t1,
         regexp_replace(t1, '{_RE_IPV4}', '[IP]', 'g') AS t2
  FROM s1
)
SELECT doc_id, source,
       CAST(len(regexp_extract_all(t,  '{_RE_EMAIL}'))   AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{_RE_IPV4}'))    AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t2, '{_RE_LONGNUM}')) AS BIGINT) AS n_longnums,
       CAST(length(regexp_replace(t2, '{_RE_LONGNUM}', '[NUM]', 'g')) AS BIGINT)
         AS clean_len,
       md5(regexp_replace(t2, '{_RE_LONGNUM}', '[NUM]', 'g')) AS clean_md5
FROM s2
ORDER BY doc_id
"""

QUERIES["pii_scrub_docs"] = pii_scrub_docs
ORACLES["pii_scrub_docs"] = PII_SQL


# --------------------------------------------------------------------------
# sliding-window chunking
# --------------------------------------------------------------------------

CHUNK_W = 120  # chunk width, chars
CHUNK_S = 80  # stride, chars (40-char overlap)


def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (doc, chunk): start offsets 0, S, 2S, … strictly
    below the doc length, each chunk the next W chars (tail chunks
    run short). sequence()+explode is a generator expression — per
    row, no join, no shuffle until the final sort — and only the
    chunk's md5/length leave the projection."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    sized = docs.filter(F.length("text") > 0).select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(0),
                F.length("text") - F.lit(1),
                F.lit(CHUNK_S),
            )
        ).alias("start_char"),
    )
    chunk = F.substring(
        F.col("text"), F.col("start_char") + 1, CHUNK_W
    )
    return sized.select(
        "doc_id",
        F.expr(f"CAST(start_char DIV {CHUNK_S} AS BIGINT)").alias("chunk_id"),
        F.col("start_char").cast("long"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk.cast("binary")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


CHUNK_SQL = f"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE length(text) > 0
), starts AS (
  SELECT doc_id, text,
         unnest(generate_series(0, CAST(length(text) - 1 AS BIGINT), {CHUNK_S}))
           AS start_char
  FROM d
)
SELECT doc_id,
       CAST(start_char // {CHUNK_S} AS BIGINT) AS chunk_id,
       CAST(start_char AS BIGINT) AS start_char,
       CAST(length(substr(text, CAST(start_char + 1 AS INT), {CHUNK_W}))
            AS BIGINT) AS chunk_len,
       md5(substr(text, CAST(start_char + 1 AS INT), {CHUNK_W})) AS chunk_md5
FROM starts
ORDER BY doc_id, chunk_id
"""

QUERIES["chunk_documents_overlap"] = chunk_documents_overlap
ORACLES["chunk_documents_overlap"] = CHUNK_SQL


# --------------------------------------------------------------------------
# tokenizer fertility
# --------------------------------------------------------------------------


def tokenizer_fertility_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per source: corpus mass (docs, chars, utf-8 bytes, whitespace
    tokens) and the fertility ratios chars/token and bytes/token on
    the exact integer micro grid — the screen that catches a
    tokenizer (or a corpus slice) whose token counts silently blow up
    the training budget."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    per_doc = docs.select(
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.octet_length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
        token_count_from("text", toks).cast("long").alias("n_tokens"),
    )
    g = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars"),
        F.sum("n_bytes").alias("bytes"),
        F.sum("n_tokens").alias("toks"),
    )
    # integer DIV, not float divide-then-cast: a double quotient can
    # round across an integer boundary and diverge from DuckDB's //
    return g.select(
        "source",
        "n_docs",
        "chars",
        "bytes",
        "toks",
        F.expr("CAST((chars * 1000000) DIV toks AS BIGINT)").alias(
            "chars_per_token_micro"
        ),
        F.expr("CAST((bytes * 1000000) DIV toks AS BIGINT)").alias(
            "bytes_per_token_micro"
        ),
    ).orderBy("source")


_TOKN_SQL = f"len(list_filter({tokens_sql('text')}, t -> t <> ''))"

FERTILITY_SQL = f"""
WITH per AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST({_TOKN_SQL} AS BIGINT) AS n_tokens
  FROM documents
), g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars,
         CAST(sum(n_bytes) AS BIGINT) AS bytes,
         CAST(sum(n_tokens) AS BIGINT) AS toks
  FROM per GROUP BY source
)
SELECT source, n_docs, chars, bytes, toks,
       CAST(chars * 1000000 // toks AS BIGINT) AS chars_per_token_micro,
       CAST(bytes * 1000000 // toks AS BIGINT) AS bytes_per_token_micro
FROM g
ORDER BY source
"""

QUERIES["tokenizer_fertility_by_source"] = tokenizer_fertility_by_source
ORACLES["tokenizer_fertility_by_source"] = FERTILITY_SQL
