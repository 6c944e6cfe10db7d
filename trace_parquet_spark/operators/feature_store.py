"""Point-in-time-correct training-set assembly (feature-store join).

``pit_features_7d`` builds, for every *label* event (a purchase), the
feature vector a model is allowed to see at that moment: counts and
value sums of behavioral events from the SAME user STRICTLY BEFORE
the label — a 7-day lookback with no leakage. Getting this cut wrong
(including the label's own instant, or anything after it) is the
classic silent train/serve skew bug in ML pipelines; here the cut is
explicit and engine-checked.

Shape: ONE window pass over the per-user event stream — labels and
features ride the same RANGE frame (`604800 PRECEDING .. 1
PRECEDING` on epoch seconds), with per-feature conditional sums.
No self-join: at 100 TB an events⋈events range join re-shuffles the
stream twice and explodes on hot users, while the frame computes all
features in the label row's window state. The frame boundary is
value-based (epoch seconds), so co-second events share membership
identically in both engines; "strictly before" is second-granular by
construction. Money stays on the exact cent grid (floor(v·100+0.5)
int64 sums — the repo-wide grid_sum rule), so no float rounding rule
is needed.

Reference: no counterpart (single-query export engine; SURVEY.md
§2.5 — no window functions exist). North-star ML-infrastructure
extension alongside plans/temporal.py and operators/udaf.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table

LOOKBACK_S = 7 * 86400


def pit_features_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.col("ts").cast("timestamp").cast("long").alias("epoch_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-LOOKBACK_S, -1)
    )

    def cond_sum(pred, col):
        return F.coalesce(
            F.sum(F.when(pred, col).otherwise(F.lit(0))).over(w), F.lit(0)
        ).cast("long")

    is_view = F.col("event_type") == "view"
    is_click = F.col("event_type") == "click"
    feat = (
        ev.withColumn("n_views_7d", cond_sum(is_view, F.lit(1)))
        .withColumn("n_clicks_7d", cond_sum(is_click, F.lit(1)))
        .withColumn("view_cents_7d", cond_sum(is_view, F.col("cents")))
    )
    return (
        feat.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "epoch_s",
            "n_views_7d",
            "n_clicks_7d",
            "view_cents_7d",
            F.col("cents").alias("label_cents"),
        )
        .orderBy("event_id")
    )


PIT_FEATURES_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s
  FROM events
),
f AS (
  SELECT event_id, user_id, event_type, epoch_s, cents,
         CAST(COALESCE(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       OVER w, 0) AS BIGINT) AS n_views_7d,
         CAST(COALESCE(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       OVER w, 0) AS BIGINT) AS n_clicks_7d,
         CAST(COALESCE(sum(CASE WHEN event_type = 'view' THEN cents ELSE 0 END)
                       OVER w, 0) AS BIGINT) AS view_cents_7d
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
               RANGE BETWEEN {LOOKBACK_S} PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, epoch_s, n_views_7d, n_clicks_7d, view_cents_7d,
       cents AS label_cents
FROM f
WHERE event_type = 'purchase'
ORDER BY event_id
"""


QUERIES = {"pit_features_7d": pit_features_7d}
ORACLES = {"pit_features_7d": PIT_FEATURES_SQL}
