"""Custom UDAF surface: grouped applyInPandas (batch) — the Spark
shape for aggregations built-ins can't express (SURVEY §2.10: the
reference has no UDF framework at all; this is the extension point).

Example operator: per-user linear trend (regression slope) of event
value over time. The arithmetic is done in EXACT integers inside the
pandas group function (value is on a cent grid, time truncated to
whole seconds; Python ints are arbitrary-precision), so the final
double division is bit-identical to the DuckDB oracle's formula —
a custom Python aggregation that still passes an exact SQL gate.

At scale: applyInPandas shuffles by the group key once; each group is
a pandas DataFrame in an Arrow batch. Keep group cardinality above
executor count and per-group size in memory (users × events here).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

EPOCH_2024 = 1704067200  # 2024-01-01 UTC, keeps x small


def _trend(pdf: pd.DataFrame) -> pd.DataFrame:
    # exact integer sums (Python ints: no int64 overflow, no fp noise)
    xs = [int(x) for x in pdf["x"]]
    ys = [int(y) for y in pdf["y"]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = n * sxx - sx * sx
    num = n * sxy - sx * sy
    # y is cents → /100; x in seconds → slope in value-units/second.
    # Round num and den to double BEFORE dividing — the oracle computes
    # CAST(num AS DOUBLE)/CAST(den AS DOUBLE), and Python's exact int
    # division (single rounding) can differ in the last ulp once the
    # products exceed 2^53.
    slope = 0.0 if den == 0 else (float(num) / float(den)) / 100.0
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [n],
            "slope_per_sec": [slope],
        }
    )


def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        (
            F.col("ts").cast("timestamp").cast("long") - F.lit(EPOCH_2024)
        ).alias("x"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    out = pts.groupBy("user_id").applyInPandas(
        _trend, schema="user_id long, n_events long, slope_per_sec double"
    )
    return out.orderBy("user_id")


USER_TREND_SQL = f"""
WITH pts AS (
  SELECT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) - {EPOCH_2024} AS x,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
  FROM events
),
s AS (
  SELECT user_id, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM pts GROUP BY user_id
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
            ELSE (CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE)) / 100.0
       END AS slope_per_sec
FROM s
ORDER BY user_id
"""


QUERIES = {"user_value_trend": user_value_trend}
ORACLES = {"user_value_trend": USER_TREND_SQL}
