"""MERGE (upsert) semantics as a join rewrite.

Lakehouse MERGE INTO — update matched keys, insert unmatched — without
a table format: the same full-outer-join + coalesce plan Delta/Iceberg
execute underneath, expressed directly on DataFrames. At scale the
join shuffles on the merge key once; with bucketed/partitioned base
tables the exchange on the base side disappears (sources/bucketing).

Demonstrated as a driver query: the 'base' snapshot is each user's
event state before a cutoff, the 'updates' stream is the events after
it; the merged result is the upserted latest state per user — checked
against a DuckDB FULL OUTER JOIN oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table

MERGE_CUTOFF = "2024-01-20 00:00:00"


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Generic upsert: one row per key; updates win over base.
    Column set: union of both sides' non-key columns via coalesce
    (update column first). Full outer join on the key — matched rows
    take update values, update-only rows insert, base-only rows carry
    through."""
    u = updates.select(
        F.col(key).alias("__k"),
        *[F.col(c).alias(f"__u_{c}") for c in updates.columns if c != key],
    )
    joined = base.join(u, base[key] == u["__k"], "full_outer")
    cols = [F.coalesce(base[key], F.col("__k")).alias(key)]
    for c in base.columns:
        if c == key:
            continue
        if f"__u_{c}" in u.columns:
            cols.append(F.coalesce(F.col(f"__u_{c}"), base[c]).alias(c))
        else:
            cols.append(base[c])
    for c in updates.columns:
        if c != key and c not in base.columns:
            cols.append(F.col(f"__u_{c}").alias(c))
    return joined.select(*cols)


def _latest_state(ev: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            (F.round(F.col("value") * 100).cast("long") / F.lit(100.0))
            .alias("last_value"),
        )
    )


def merge_upsert_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = _latest_state(ev.filter(F.col("ts") < MERGE_CUTOFF))
    updates = _latest_state(ev.filter(F.col("ts") >= MERGE_CUTOFF))
    return merge_upsert(base, updates, "user_id").orderBy("user_id")


_STATE_CTE = """
  SELECT user_id, event_id AS last_event_id, event_type AS last_type,
         (CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) / 100) AS last_value
  FROM (
    SELECT user_id, event_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE {pred}
  ) WHERE rn = 1
"""

MERGE_SQL = f"""
WITH base AS ({_STATE_CTE.format(pred=f"CAST(ts AS TIMESTAMP) < TIMESTAMP '{MERGE_CUTOFF}'")}),
upd AS ({_STATE_CTE.format(pred=f"CAST(ts AS TIMESTAMP) >= TIMESTAMP '{MERGE_CUTOFF}'")})
SELECT coalesce(b.user_id, u.user_id)             AS user_id,
       coalesce(u.last_event_id, b.last_event_id) AS last_event_id,
       coalesce(u.last_type, b.last_type)         AS last_type,
       coalesce(u.last_value, b.last_value)       AS last_value
FROM base b FULL OUTER JOIN upd u ON b.user_id = u.user_id
ORDER BY user_id
"""


QUERIES = {"merge_upsert_user_state": merge_upsert_user_state}
ORACLES = {"merge_upsert_user_state": MERGE_SQL}
