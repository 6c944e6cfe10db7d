"""Incremental-maintenance query shapes: mergeable partial aggregates
and time-hierarchy rollups — the patterns that keep a 100 TB rollup
cheap to maintain (re-aggregate deltas, never recompute history).

The reference recomputes its single query from scratch per request
(service/DataExportService.java:31-43 — stateless read); these cover
SURVEY §2.4's aggregation checklist from the maintenance side.

- ``incremental_agg_merge`` proves the algebraic-aggregate contract:
  per-key partials (count, exact integer sum) computed independently
  over a history slice and a delta slice, unioned and re-aggregated,
  must equal the direct full aggregation. This is exactly how a daily
  rollup absorbs a new day at scale: the history partials are a tiny
  stored table, only the delta touches raw data. The oracle IS the
  direct aggregation, so the gate checks merged == direct.
- ``time_rollup_counts`` is the hierarchical time dimension rollup
  (year → month → day) in ONE pass via ROLLUP over date_trunc columns
  — a single Expand + partial agg, not three scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

# deterministic history/delta split of the events change stream
_DELTA_MOD = 3


def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge per-user partial aggregates from a history slice and a
    delta slice; output the combined (n, total, mean).

    Scale: each slice aggregates map-side to per-user partials before
    the single shuffle; the union then re-aggregates rows that are
    already key-grained (2 rows per user max). History partials would
    be a stored table in production — the plan shape is identical.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("qv"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("pn"), F.sum("qv").alias("ps")
        )

    hist = partial(ev.filter(F.col("event_id") % _DELTA_MOD != 0))
    delta = partial(ev.filter(F.col("event_id") % _DELTA_MOD == 0))
    return (
        hist.unionByName(delta)
        .groupBy("user_id")
        .agg(F.sum("pn").alias("n_events"), F.sum("ps").alias("sum_q"))
        .select(
            "user_id",
            "n_events",
            (F.col("sum_q") / F.lit(100.0)).alias("total_value"),
            # exact ints → one double division each: bit-identical
            (F.col("sum_q") / F.col("n_events") / F.lit(100.0)).alias(
                "mean_value"
            ),
        )
        .orderBy("user_id")
    )


# The oracle is the DIRECT full aggregation — passing the gate proves
# merged-partials ≡ recompute (the algebraic-aggregate law).
INCREMENTAL_AGG_SQL = """
WITH q AS (
  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS qv
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT)                       AS n_events,
       CAST(sum(qv) AS BIGINT) / 100.0                AS total_value,
       CAST(sum(qv) AS DOUBLE) / count(*) / 100.0     AS mean_value
FROM q
GROUP BY user_id
ORDER BY user_id
"""


def time_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year→month→day hierarchical event counts in one ROLLUP pass.

    Scale: ROLLUP compiles to a single Expand (×4 grouping levels)
    feeding one partial-aggregated shuffle — at any size this touches
    events exactly once, vs 3 scans for per-level GROUP BYs.
    """
    ev = load_table(spark, sf_dir, "events")
    staged = ev.select(
        F.date_trunc("year", "ts").alias("y"),
        F.date_trunc("month", "ts").alias("m"),
        F.date_trunc("day", "ts").alias("d"),
        "value",
    )
    return (
        staged.rollup("y", "m", "d")
        .agg(
            F.count("*").alias("n_events"),
            F.grouping_id("y", "m", "d").cast("long").alias("lvl"),
        )
        .orderBy(
            F.col("y").asc_nulls_first(),
            F.col("m").asc_nulls_first(),
            F.col("d").asc_nulls_first(),
        )
    )


TIME_ROLLUP_SQL = """
WITH staged AS (
  SELECT date_trunc('year',  CAST(ts AS TIMESTAMP)) AS y,
         date_trunc('month', CAST(ts AS TIMESTAMP)) AS m,
         date_trunc('day',   CAST(ts AS TIMESTAMP)) AS d
  FROM events
)
SELECT y, m, d,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(grouping(y) * 4 + grouping(m) * 2 + grouping(d) AS BIGINT) AS lvl
FROM staged
GROUP BY ROLLUP (y, m, d)
ORDER BY y NULLS FIRST, m NULLS FIRST, d NULLS FIRST
"""


QUERIES = {
    "incremental_agg_merge": incremental_agg_merge,
    "time_rollup_counts": time_rollup_counts,
}

ORACLES = {
    "incremental_agg_merge": INCREMENTAL_AGG_SQL,
    "time_rollup_counts": TIME_ROLLUP_SQL,
}
