"""Data-quality operators: permissive semi-structured parsing and
table profiling.

- **parse_props_permissive**: real pipelines meet malformed JSON;
  Spark's ``from_json`` is PERMISSIVE by default (bad input → NULL
  row, job survives — E5's fail-fast is the *reference's* contract for
  its trusted payloads; ingest from the wild wants the permissive
  mode). Corruption is injected deterministically (a hash rule) so the
  DuckDB oracle (json_valid + json_extract) can agree row-for-row.
- **profile_lineitem**: ANALYZE-style column profile (rows, nulls,
  distincts, min/max) as one aggregation pass per profile row —
  the stats every partition-strategy decision starts from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.registry import load_table

CORRUPT_MOD = 7  # event_id % 7 == 0 → payload corrupted


def parse_props_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "raw",
        F.when(
            F.col("event_id") % CORRUPT_MOD == 0,
            F.concat(F.lit("x"), F.col("props")),
        ).otherwise(F.col("props")),
    )
    parsed = ev.withColumn(
        "k",
        F.from_json(
            F.col("raw"), T.StructType([T.StructField("k", T.LongType())])
        )["k"],
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_bad"),
            F.sum("k").alias("k_sum"),
        )
        .orderBy("event_type")
    )


PARSE_PERMISSIVE_SQL = f"""
WITH raw AS (
  SELECT event_type,
         CASE WHEN event_id % {CORRUPT_MOD} = 0 THEN 'x' || props
              ELSE props END AS raw
  FROM events
),
parsed AS (
  SELECT event_type,
         CASE WHEN json_valid(raw)
              THEN CAST(json_extract(raw, '$.k') AS BIGINT)
              ELSE NULL END AS k
  FROM raw
)
SELECT event_type,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
       CAST(sum(k) AS BIGINT) AS k_sum
FROM parsed
GROUP BY event_type
ORDER BY event_type
"""


_PROFILE_COLS = (
    "l_orderkey",
    "l_quantity",
    "l_extendedprice",
    "l_returnflag",
    "l_shipdate",
)


def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One profile row per column: all stats in a single wide
    aggregation (one scan), then unpivoted — never one job per column.
    min/max serialize to strings so heterogeneous column types share a
    schema."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__nulls").cast("long").alias("n_null"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
        )
        for c in _PROFILE_COLS
    ]
    return (
        wide.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("column_name")
    )


def _profile_sql() -> str:
    parts = []
    for c in _PROFILE_COLS:
        if c == "l_shipdate":
            mn, mx = (
                f"CAST(CAST(min({c}) AS TIMESTAMP) AS VARCHAR)",
                f"CAST(CAST(max({c}) AS TIMESTAMP) AS VARCHAR)",
            )
        else:
            mn, mx = f"CAST(min({c}) AS VARCHAR)", f"CAST(max({c}) AS VARCHAR)"
        parts.append(f"""
  SELECT '{c}' AS column_name,
         count({c}) AS n,
         CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         count(DISTINCT {c}) AS n_distinct,
         {mn} AS min_str,
         {mx} AS max_str
  FROM lineitem""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY column_name"


PROFILE_SQL = _profile_sql()


QUERIES = {
    "parse_props_permissive": parse_props_permissive,
    "profile_lineitem": profile_lineitem,
}

ORACLES = {
    "parse_props_permissive": PARSE_PERMISSIVE_SQL,
    "profile_lineitem": PROFILE_SQL,
}
