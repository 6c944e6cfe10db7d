"""Time-window rollups over the event stream (batch form).

The streaming twins (withWatermark + window/session_window on a
readStream) live in ``streaming/pipeline.py``; these batch versions
share the same window semantics, so the oracle check of the batch
query also validates the streaming aggregation logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import money_sum


def tumbling_window_agg(
    df: DataFrame, ts: str = "ts", width: str = "1 hour"
) -> DataFrame:
    """Tumbling windows: groupBy(window(ts, w), event_type). Spark's
    ``window()`` floors ts to the window grid — identical to
    date_trunc for aligned widths."""
    return (
        df.groupBy(F.window(F.col(ts), width), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


TUMBLING_SQL = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       count(*)             AS n_events,
       (CAST(sum(CAST(round((value) * 100) AS BIGINT)) AS DOUBLE) / 100) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def sliding_window_agg(
    df: DataFrame, ts: str = "ts", width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding windows — each event lands in width/slide windows."""
    return (
        df.groupBy(F.window(F.col(ts), width, slide))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
        .orderBy("window_start")
    )


SLIDING_SQL = """
-- every event belongs to two 1h windows on a 30min grid:
-- the window starting at trunc(ts, 30min) and the one 30min earlier
WITH hits AS (
  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS window_start
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '30 minutes'
  FROM events
)
SELECT window_start, count(*) AS n_events
FROM hits GROUP BY window_start ORDER BY window_start
"""


def session_window_agg(
    df: DataFrame, key: str = "user_id", ts: str = "ts", gap: str = "30 minutes"
) -> DataFrame:
    """Spark's native session_window (merges events closer than gap;
    window end = last_ts + gap)."""
    return (
        df.groupBy(F.session_window(F.col(ts), gap), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .orderBy(key, "session_start")
    )


SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR epoch(CAST(ts AS TIMESTAMP))
                   - epoch(lag(CAST(ts AS TIMESTAMP)) OVER w) >= 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
sessions AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       min(ts)                           AS session_start,
       max(ts) + INTERVAL '30 minutes'   AS session_end,
       count(*)                          AS n_events
FROM sessions
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""
