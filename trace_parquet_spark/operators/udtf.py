"""Python UDTF surface (SURVEY §2.10 — the one user-function shape the
round-1 engine didn't demonstrate; Spark 4 ``@udtf``).

A UDTF is the table-valued extension point: one input row → many
output rows with a declared schema, registered and invoked from SQL
(LATERAL-style). Demonstrated here as a token exploder over
``documents``: (doc_id, text) → (doc_id, pos, token) rows, using the
SAME normalization as functions/text.py so the DuckDB oracle (zipped
unnest of token list + position list) hash-matches.

Scale note: UDTFs are a per-row Python path — correct tool when the
row fan-out logic genuinely needs Python (custom parsers, generators).
For anything expressible as explode(arrays) stay JVM-side; the engine's
other operators do exactly that. This module is the API-coverage
demonstration, deliberately bounded to a doc_id slice.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

UDTF_DOC_MAX = 100
# Mirrors functions/text.py norm_text: lower + trim + collapse \s+.
_WS_RE = re.compile(r"\s+")


def _norm_tokens(text: str | None) -> list[str]:
    if text is None:
        return []
    norm = _WS_RE.sub(" ", text.strip().lower())
    if not norm:
        return []
    return norm.split(" ")


class ExplodeTokens:
    """UDTF body: eval() yields one row per token with its 1-based
    position (reference has no UDF framework at all — SURVEY §2.10;
    this is the north-star extension surface)."""

    def eval(self, doc_id: int, text: str):  # noqa: A002 - Spark UDTF signature
        for pos, tok in enumerate(_norm_tokens(text), start=1):
            yield doc_id, pos, tok


def explode_tokens_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    exploder = udtf(
        ExplodeTokens, returnType="doc_id bigint, pos bigint, token string"
    )
    spark.udtf.register("explode_tokens", exploder)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < UDTF_DOC_MAX
    )
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.token
        FROM udtf_docs d,
             LATERAL explode_tokens(d.doc_id, d.text) t
        ORDER BY t.doc_id, t.pos
        """
    )


# DuckDB: multiple unnests in one SELECT are zipped positionally, which
# pairs each token with its 1-based position.
UDTF_TOKENS_SQL = f"""
WITH t AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
  WHERE doc_id < {UDTF_DOC_MAX} AND length(trim(text)) > 0
)
SELECT doc_id,
       CAST(unnest(generate_series(1, len(toks))) AS BIGINT) AS pos,
       unnest(toks) AS token
FROM t
ORDER BY doc_id, pos
"""


QUERIES = {"explode_tokens_udtf": explode_tokens_udtf}
ORACLES = {"explode_tokens_udtf": UDTF_TOKENS_SQL}


# --------------------------------------------------------------------------
# polymorphic UDTF: output schema computed by analyze() (Spark 4)
# --------------------------------------------------------------------------

SPLIT_N = 3  # parts per document in the gated query


class SplitParts:
    """Polymorphic UDTF: splits a text into N equal-width character
    parts where N is a CONSTANT argument and the OUTPUT SCHEMA —
    part_1..part_N string columns — is computed at plan time by
    ``analyze()`` (the Spark 4 dynamic-schema UDTF surface; a static
    returnType cannot express column count depending on an argument).
    Width = ceil(len/N); missing tails yield empty strings, so every
    row emits exactly one output row with N parts."""

    @staticmethod
    def analyze(doc_id, text, n):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )
        from pyspark.sql.udtf import AnalyzeResult

        if n.value is None or not isinstance(n.value, int):
            raise ValueError("split_parts: n must be a constant integer")
        fields = [StructField("doc_id", LongType())] + [
            StructField(f"part_{i}", StringType())
            for i in range(1, n.value + 1)
        ]
        return AnalyzeResult(StructType(fields))

    def eval(self, doc_id: int, text: str, n: int):
        s = text or ""
        w = -(-len(s) // n) if s else 0
        parts = [
            s[i * w : (i + 1) * w] if w else "" for i in range(n)
        ]
        yield (doc_id, *parts)


def split_parts_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    spark.udtf.register("split_parts", udtf(SplitParts))
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < UDTF_DOC_MAX
    )
    docs.createOrReplaceTempView("udtf_docs_sp")
    return spark.sql(
        f"""
        SELECT s.doc_id, s.part_1, s.part_2, s.part_3
        FROM udtf_docs_sp d,
             LATERAL split_parts(d.doc_id, d.text, {SPLIT_N}) s
        ORDER BY s.doc_id
        """
    )


# ceil-width substring replay; length(text)=0 rows yield empty parts
UDTF_SPLIT_SQL = f"""
WITH d AS (
  SELECT doc_id, text,
         CASE WHEN length(text) = 0 THEN 0
              ELSE (length(text) + {SPLIT_N} - 1) // {SPLIT_N} END AS w
  FROM documents WHERE doc_id < {UDTF_DOC_MAX}
)
SELECT doc_id,
       substring(text, 1, w)         AS part_1,
       substring(text, w + 1, w)     AS part_2,
       substring(text, 2 * w + 1, w) AS part_3
FROM d
ORDER BY doc_id
"""

QUERIES["split_parts_udtf"] = split_parts_udtf
ORACLES["split_parts_udtf"] = UDTF_SPLIT_SQL
