"""Sessionization — gaps-and-islands over an event stream.

The natural extension of the reference's data model (time-interval
rows per paramIndex; SURVEY §2.5 notes the reference has no window
functions at all). Batch implementation is pure window functions:
lag → gap flag → running sum = session id. One shuffle on the
partition key; at 100 TB the key (user_id) is the natural partition
and AQE handles skewed users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.money import money_sum


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event (per key) exceeds ``gap_minutes``."""
    w = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    # ntz → (session-TZ) timestamp → epoch seconds; the TZ shift cancels
    # in the subtraction, and the session is pinned UTC anyway
    epoch = F.col(ts).cast("timestamp").cast("double")
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session summary: bounds, event count, value sum."""
    s = sessionize(df, key=key, ts=ts, gap_minutes=gap_minutes)
    return (
        s.groupBy(key, "session_id")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count("*").alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .orderBy(key, "session_id")
    )


SESSION_STATS_SQL_TEMPLATE = """
WITH flagged AS (
  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR epoch(CAST(ts AS TIMESTAMP))
                   - epoch(lag(CAST(ts AS TIMESTAMP)) OVER w) > {gap_seconds}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       min(ts)                 AS session_start,
       max(ts)                 AS session_end,
       count(*)                AS n_events,
       (CAST(sum(CAST(round((value) * 100) AS BIGINT)) AS DOUBLE) / 100)    AS total_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""
