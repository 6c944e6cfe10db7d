"""Product-analytics query shapes over the event stream: ordered
funnel conversion and weekly cohort retention.

The reference has no event analytics (single filter+sort query,
repository/ParameterDataRepository.java:53-78); these extend SURVEY §2.4/§2.5
with the two queries every events warehouse gets asked first.

- ``funnel_conversion``: how many users progress through the ordered
  stage sequence signup → view → click → purchase, where each stage's
  event must be strictly LATER than the previous stage's. Implemented
  as a per-user greedy state machine folded over the time-sorted event
  array with F.aggregate — ONE pass over events, one shuffle on
  user_id, no per-stage self-joins. (Greedy earliest-match ≡ "exists a
  strictly increasing chain", the standard subsequence argument, which
  is what the oracle's chain-of-min-after CTEs compute.)
- ``cohort_retention``: users grouped by first-seen week; retention at
  week k = fraction of the cohort active k weeks later. Two shuffles
  (first-seen agg, distinct active-weeks agg) + a broadcast-sized
  join; the ratio is one long/long double division (bit-identical).

Scale: both collapse raw events to per-user / per-(cohort, week)
grains before anything quadratic could happen; per-user event arrays
are the only memory risk and are bounded by per-user activity, the
same bound every per-user window in this repo already assumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from ..session import track_cache

STAGES = ["signup", "view", "click", "purchase"]


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.select("user_id", F.struct("ts", "event_id", "event_type").alias("e"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("e")).alias("seq"))
    )
    stage_names = F.array(*[F.lit(s) for s in STAGES])
    n_stages = len(STAGES)
    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("timestamp_ntz").alias("t"),
    )

    def step(acc, x):
        wanted = F.element_at(
            stage_names, F.least(acc["stage"] + 1, F.lit(n_stages))
        )
        advance = (
            (acc["stage"] < n_stages)
            & (x["event_type"] == wanted)
            & (acc["t"].isNull() | (x["ts"] > acc["t"]))
        )
        return F.when(
            advance,
            F.struct(
                (acc["stage"] + 1).alias("stage"), x["ts"].alias("t")
            ),
        ).otherwise(acc)

    finals = seq.select(
        "user_id", F.aggregate("seq", init, step)["stage"].alias("final_stage")
    )
    per_stage = (
        finals.join(
            spark.range(1, n_stages + 1).select(
                F.col("id").cast("int").alias("stage_idx")
            ),
            F.col("final_stage") >= F.col("stage_idx"),
        )
        .groupBy("stage_idx")
        .agg(F.count("*").alias("n_users"))
    )
    # global window is stage-grain bounded: one row per funnel stage
    worder = Window.orderBy("stage_idx")
    return per_stage.select(
        F.col("stage_idx").cast("long").alias("stage_idx"),
        F.element_at(stage_names, F.col("stage_idx")).alias("stage_name"),
        "n_users",
        (F.col("n_users") / F.lag("n_users").over(worder)).alias(
            "conv_from_prev"
        ),
    ).orderBy("stage_idx")


# users reaching stage k = the chain-of-strictly-later-min CTEs; the
# greedy fold above computes exactly this reachability.
FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
), u1 AS (
  SELECT user_id, min(ts) AS t FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
), u2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM ev e JOIN u1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > u1.t GROUP BY e.user_id
), u3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM ev e JOIN u2 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > u2.t GROUP BY e.user_id
), u4 AS (
  SELECT e.user_id, min(e.ts) AS t FROM ev e JOIN u3 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > u3.t GROUP BY e.user_id
), counts AS (
  SELECT 1 AS stage_idx, 'signup'   AS stage_name, (SELECT count(*) FROM u1) AS n_users
  UNION ALL
  SELECT 2, 'view',     (SELECT count(*) FROM u2)
  UNION ALL
  SELECT 3, 'click',    (SELECT count(*) FROM u3)
  UNION ALL
  SELECT 4, 'purchase', (SELECT count(*) FROM u4)
)
SELECT CAST(stage_idx AS BIGINT) AS stage_idx,
       stage_name,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_users AS DOUBLE)
         / lag(n_users) OVER (ORDER BY stage_idx) AS conv_from_prev
FROM counts
ORDER BY stage_idx
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    k = (
        F.datediff(F.to_date("active_week"), F.to_date("cohort_week")) / 7
    ).cast("long")
    counts = (
        active.join(cohorts, "user_id")
        .select("cohort_week", k.alias("week_k"), "user_id")
        .groupBy("cohort_week", "week_k")
        .agg(F.count("*").alias("n_active"))
    )
    sizes = counts.filter(F.col("week_k") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return (
        counts.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_k",
            "n_active",
            (F.col("n_active") / F.col("cohort_size")).alias("retention"),
        )
        .orderBy("cohort_week", "week_k")
    )


COHORT_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
), cohorts AS (
  SELECT user_id,
         CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
  FROM ev GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
  FROM ev
), counts AS (
  SELECT cohort_week,
         CAST(date_diff('day', CAST(cohort_week AS DATE),
                        CAST(active_week AS DATE)) / 7 AS BIGINT) AS week_k,
         CAST(count(*) AS BIGINT) AS n_active
  FROM active JOIN cohorts USING (user_id)
  GROUP BY 1, 2
)
SELECT c.cohort_week, c.week_k, c.n_active,
       CAST(c.n_active AS DOUBLE) / s.n_active AS retention
FROM counts c
JOIN (SELECT cohort_week, n_active FROM counts WHERE week_k = 0) s
  USING (cohort_week)
ORDER BY cohort_week, week_k
"""


def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seconds from first signup to the first strictly-later purchase,
    summarized per signup-week cohort (n, median, p90). The deltas are
    exact integer seconds (truncating ts→long equals DuckDB's
    date_diff('second') boundary count), so the interpolated
    percentiles land on .0/.5 exactly in both engines.

    Scale: two per-user aggregates (one shuffle each on user_id) and a
    per-cohort percentile over converted users only.
    """
    ev = load_table(spark, sf_dir, "events")
    sign = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t0")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(sign, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"), F.first("t0").alias("t0"))
    )
    secs = purch.select(
        F.date_trunc("week", "t0").alias("cohort_week"),
        (
            F.col("t1").cast("timestamp").cast("long")
            - F.col("t0").cast("timestamp").cast("long")
        ).alias("delta_s"),
    )
    return (
        secs.groupBy("cohort_week")
        .agg(
            F.count("*").alias("n_converted"),
            F.expr("percentile(delta_s, 0.5)").alias("median_s"),
            F.expr("percentile(delta_s, 0.9)").alias("p90_s"),
        )
        .orderBy("cohort_week")
    )


TIME_TO_CONVERT_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
), sign AS (
  SELECT user_id, min(ts) AS t0 FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
), purch AS (
  SELECT e.user_id, min(e.ts) AS t1, min(s.t0) AS t0
  FROM ev e JOIN sign s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s.t0
  GROUP BY e.user_id
), secs AS (
  SELECT CAST(date_trunc('week', t0) AS TIMESTAMP) AS cohort_week,
         CAST(date_diff('second', t0, t1) AS BIGINT) AS delta_s
  FROM purch
)
SELECT cohort_week,
       CAST(count(*) AS BIGINT)      AS n_converted,
       quantile_cont(delta_s, 0.5)   AS median_s,
       quantile_cont(delta_s, 0.9)   AS p90_s
FROM secs
GROUP BY cohort_week
ORDER BY cohort_week
"""


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
    "time_to_convert": time_to_convert,
}

ORACLES = {
    "funnel_conversion": FUNNEL_SQL,
    "cohort_retention": COHORT_SQL,
    "time_to_convert": TIME_TO_CONVERT_SQL,
}


def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for signup→purchase conversion at
    day grain, WITH censoring — the estimator time_to_convert's
    percentiles cannot replace: users who signed up but never
    purchased are right-censored at the corpus horizon (max event ts)
    instead of being silently dropped, so late cohorts stop biasing
    conversion speed down. Ŝ(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over conversion
    days; censored-at-t users count at risk at t (the standard
    convention).

    Exactness: every nᵢ, dᵢ is an integer on the DAY-grain spine
    (value-cardinality bounded — the KS/PSI discipline); each factor's
    ln((n−d)/n) lands on the micro-nat grid, the product becomes a
    spine cumsum of integers, and Ŝ is ONE exp() over the exact
    micro-nat sum. Scale: two per-user aggregates (user_id shuffles),
    one count-per-day aggregation, then constant-size spine windows;
    the horizon is a cutoff scalar.

    A day where every remaining at-risk user converts (n = d) sends
    Ŝ to exactly 0 — emitted with NULL micro-nats (ln 0 undefined)
    and s_hat 0."""
    ev = load_table(spark, sf_dir, "events")
    tmax = ev.agg(F.max("ts")).collect()[0][0]
    sign = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(sign, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    users = sign.join(purch, "user_id", "left").select(
        "user_id",
        F.coalesce(
            F.datediff(F.to_date("t1"), F.to_date("t0")),
            F.datediff(F.to_date(F.lit(tmax)), F.to_date("t0")),
        ).cast("long").alias("t"),
        F.col("t1").isNotNull().alias("is_event"),
    )
    # per_day is consumed twice (totals + spine); cache the tiny
    # day-grain relation so the user-join plan runs once
    per_day = users.groupBy("t").agg(
        F.count("*").alias("n_at"),
        F.sum(F.col("is_event").cast("long")).alias("d"),
    ).transform(track_cache)
    n_total = per_day.agg(F.sum("n_at")).collect()[0][0] or 0
    # global windows are day-spine bounded: one row per calendar day
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    spine = (
        per_day.withColumn(
            "n_risk", F.lit(n_total) - F.coalesce(F.sum("n_at").over(wcum), F.lit(0))
        )
        .where(F.col("d") > 0)
    )
    term = F.when(
        F.col("n_risk") > F.col("d"),
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    )
    wsum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    curve = spine.withColumn("term", term).select(
        "t",
        "n_risk",
        "d",
        F.when(
            F.max(F.col("term").isNull().cast("int")).over(wsum) == 0,
            F.sum("term").over(wsum),
        ).alias("s_micro_nats"),
    )
    return curve.select(
        F.col("t").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_events"),
        "s_micro_nats",
        # Java Math.exp and libm exp disagree in the last ulp for some
        # inputs (measured 7e-18); the ppm grid absorbs it
        F.coalesce(
            F.floor(
                F.exp(F.col("s_micro_nats").cast("double") / F.lit(1e6))
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("s_hat_ppm"),
    ).orderBy("t_days")


KM_SQL = """
WITH sign AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), purch AS (
  SELECT e.user_id, min(e.ts) AS t1
  FROM events e JOIN sign s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t0
  GROUP BY e.user_id
), horizon AS (SELECT max(ts) AS tmax FROM events),
users AS (
  SELECT s.user_id,
         CAST(coalesce(
           date_diff('day', CAST(s.t0 AS DATE), CAST(p.t1 AS DATE)),
           date_diff('day', CAST(s.t0 AS DATE),
                     CAST((SELECT tmax FROM horizon) AS DATE))
         ) AS BIGINT) AS t,
         p.t1 IS NOT NULL AS is_event
  FROM sign s LEFT JOIN purch p ON s.user_id = p.user_id
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM users),
per_day AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_at,
         CAST(sum(CAST(is_event AS BIGINT)) AS BIGINT) AS d
  FROM users GROUP BY t
), spine AS (
  SELECT t, d,
         (SELECT n_total FROM n)
           - coalesce(sum(n_at) OVER (ORDER BY t
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS n_risk
  FROM per_day
), ev_days AS (
  SELECT t, n_risk, d,
         CASE WHEN n_risk > d
              THEN CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
                                 / CAST(n_risk AS DOUBLE)) * 1e6 + 0.5)
                        AS BIGINT)
         END AS term
  FROM spine WHERE d > 0
), curve AS (
  SELECT t, n_risk, d,
         CASE WHEN max(CAST(term IS NULL AS INT))
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) = 0
              THEN sum(term) OVER (ORDER BY t
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
         END AS s_micro_nats
  FROM ev_days
)
SELECT t AS t_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       d AS d_events,
       CAST(s_micro_nats AS BIGINT) AS s_micro_nats,
       coalesce(CAST(floor(exp(CAST(s_micro_nats AS DOUBLE) / 1e6)
                           * 1e6 + 0.5) AS BIGINT),
                CAST(0 AS BIGINT)) AS s_hat_ppm
FROM curve
ORDER BY t_days
"""

QUERIES["kaplan_meier_conversion"] = kaplan_meier_conversion
ORACLES["kaplan_meier_conversion"] = KM_SQL


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of purchasers: per user the classic
    recency(days since last purchase) / frequency(purchase count) /
    monetary(exact cents) triple, each scored 1-3 against the
    tercile cutoffs of the purchaser population, plus the combined
    segment label — the standard CRM partitioning.

    Determinism: metrics are exact integers; tercile cutoffs are
    type-7 quantiles over those integers (.0/.5 values exact in
    double); scores compare int against cutoff with <= in both
    engines. Scale: one purchase-grain shuffle to per-user metrics;
    the six cutoffs are a scalar pull broadcast into the scoring
    projection (percentile here is exact-rank — at extreme user
    cardinality swap in approx_percentile, same shape). Horizon =
    max event ts (cutoff scalar)."""
    ev = load_table(spark, sf_dir, "events")
    tmax = ev.agg(F.max("ts")).collect()[0][0]
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.datediff(F.to_date(F.lit(tmax)), F.to_date(F.max("ts")))
            .cast("long")
            .alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "monetary_cents"
            ),
        )
    )
    cuts = per_user.agg(
        F.expr("percentile(recency_days, 0.3333333333333333)").alias("r33"),
        F.expr("percentile(recency_days, 0.6666666666666666)").alias("r66"),
        F.expr("percentile(frequency, 0.3333333333333333)").alias("f33"),
        F.expr("percentile(frequency, 0.6666666666666666)").alias("f66"),
        F.expr("percentile(monetary_cents, 0.3333333333333333)").alias("m33"),
        F.expr("percentile(monetary_cents, 0.6666666666666666)").alias("m66"),
    ).collect()[0]

    def score(col: str, lo: float, hi: float, invert: bool):
        c = F.col(col).cast("double")
        first, last = (3, 1) if invert else (1, 3)
        return (
            F.when(c <= F.lit(lo), F.lit(first))
            .when(c <= F.lit(hi), F.lit(2))
            .otherwise(F.lit(last))
            .cast("long")
        )

    scored = per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        score("recency_days", float(cuts.r33), float(cuts.r66), True).alias(
            "r_score"
        ),
        score("frequency", float(cuts.f33), float(cuts.f66), False).alias(
            "f_score"
        ),
        score("monetary_cents", float(cuts.m33), float(cuts.m66), False).alias(
            "m_score"
        ),
    )
    return scored.select(
        "*",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    ).orderBy("user_id")


RFM_SQL = """
WITH horizon AS (SELECT max(ts) AS tmax FROM events),
per_user AS (
  SELECT user_id,
         CAST(date_diff('day', CAST(max(ts) AS DATE),
                        CAST((SELECT tmax FROM horizon) AS DATE))
              AS BIGINT) AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
), cuts AS (
  SELECT quantile_cont(recency_days, 0.3333333333333333) AS r33,
         quantile_cont(recency_days, 0.6666666666666666) AS r66,
         quantile_cont(frequency, 0.3333333333333333) AS f33,
         quantile_cont(frequency, 0.6666666666666666) AS f66,
         quantile_cont(monetary_cents, 0.3333333333333333) AS m33,
         quantile_cont(monetary_cents, 0.6666666666666666) AS m66
  FROM per_user
), scored AS (
  SELECT u.user_id, u.recency_days, u.frequency, u.monetary_cents,
         CAST(CASE WHEN CAST(u.recency_days AS DOUBLE) <= c.r33 THEN 3
                   WHEN CAST(u.recency_days AS DOUBLE) <= c.r66 THEN 2
                   ELSE 1 END AS BIGINT) AS r_score,
         CAST(CASE WHEN CAST(u.frequency AS DOUBLE) <= c.f33 THEN 1
                   WHEN CAST(u.frequency AS DOUBLE) <= c.f66 THEN 2
                   ELSE 3 END AS BIGINT) AS f_score,
         CAST(CASE WHEN CAST(u.monetary_cents AS DOUBLE) <= c.m33 THEN 1
                   WHEN CAST(u.monetary_cents AS DOUBLE) <= c.m66 THEN 2
                   ELSE 3 END AS BIGINT) AS m_score
  FROM per_user u, cuts c
)
SELECT *,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment
FROM scored
ORDER BY user_id
"""

QUERIES["rfm_segments"] = rfm_segments
ORACLES["rfm_segments"] = RFM_SQL


def logrank_cohort_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing conversion survival of EARLY vs LATE
    signups (split at the median signup day) — "did conversion speed
    change?" asked properly, i.e. censoring-aware, where comparing
    time_to_convert percentiles silently drops never-converters.

    Per conversion day t (shared spine with kaplan_meier_conversion):
    group-1 at-risk n1, total at-risk n, total events d, observed d1;
    the classic O−E = d1 − d·n1/n and hypergeometric variance
    v = d·(n1/n)·(1−n1/n)·(n−d)/(n−1) accumulate over the spine and
    z = Σ(O−E)/√Σv. Each per-day term is ONE fixed double chain over
    exact integers floored to the 1e-6 grid (the PSI discipline), so
    the sums are integers and both engines agree bitwise.

    Scale: the same two user-grain aggregates as KM plus day-grain
    spine arithmetic; the cohort split is a broadcast scalar (median
    signup epoch-day, type-7 on integers)."""
    ev = load_table(spark, sf_dir, "events")
    tmax = ev.agg(F.max("ts")).collect()[0][0]
    sign = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    med_day = sign.agg(
        F.expr(
            "percentile(datediff(to_date(t0), to_date('1970-01-01')), 0.5)"
        )
    ).collect()[0][0]
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(sign, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    users = sign.join(purch, "user_id", "left").select(
        F.coalesce(
            F.datediff(F.to_date("t1"), F.to_date("t0")),
            F.datediff(F.to_date(F.lit(tmax)), F.to_date("t0")),
        ).cast("long").alias("t"),
        F.col("t1").isNotNull().alias("is_event"),
        (
            F.datediff(F.to_date("t0"), F.to_date(F.lit("1970-01-01")))
            .cast("double")
            <= F.lit(float(med_day))
        ).alias("early"),
    )
    per_day = users.groupBy("t").agg(
        F.count("*").alias("n_at"),
        F.sum(F.col("early").cast("long")).alias("n1_at"),
        F.sum(F.col("is_event").cast("long")).alias("d"),
        F.sum((F.col("is_event") & F.col("early")).cast("long")).alias("d1"),
    ).transform(track_cache)
    # global windows are day-spine bounded: one row per calendar day
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    spine = (
        per_day.select(
            "t",
            "d",
            "d1",
            (
                F.sum("n_at").over(wcum).cast("long")
            ).alias("gone"),
            (
                F.sum("n1_at").over(wcum).cast("long")
            ).alias("gone1"),
        )
        .withColumn("gone", F.coalesce(F.col("gone"), F.lit(0)))
        .withColumn("gone1", F.coalesce(F.col("gone1"), F.lit(0)))
    )
    # totals derive from the cached day-grain relation — the
    # signup/purchase join plan executes once, not three times
    tot = per_day.agg(
        F.sum("n_at").alias("nt"), F.sum("n1_at").alias("n1t")
    ).collect()[0]
    n_total, n1_total = int(tot.nt or 0), int(tot.n1t or 0)
    n = F.lit(n_total) - F.col("gone")
    n1 = F.lit(n1_total) - F.col("gone1")
    d, d1 = F.col("d"), F.col("d1")
    oe_micro = F.floor(
        (
            d1.cast("double")
            - d.cast("double") * n1.cast("double") / n.cast("double")
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    v_micro = F.when(
        n > 1,
        F.floor(
            (
                d.cast("double")
                * (n1.cast("double") / n.cast("double"))
                * (F.lit(1.0) - n1.cast("double") / n.cast("double"))
                * ((n - d).cast("double") / (n - 1).cast("double"))
            )
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0))
    terms = spine.where(F.col("d") > 0).select(
        oe_micro.alias("oe"), v_micro.alias("v")
    )
    g = terms.agg(
        F.count("*").alias("n_days"),
        F.sum("oe").alias("oe_sum_micro"),
        F.sum("v").alias("v_sum_micro"),
    )
    return g.select(
        F.col("n_days").cast("long").alias("n_event_days"),
        F.lit(n1_total).cast("long").alias("n_early"),
        F.lit(n_total - n1_total).cast("long").alias("n_late"),
        F.col("oe_sum_micro").cast("long").alias("oe_sum_micro"),
        F.col("v_sum_micro").cast("long").alias("v_sum_micro"),
        F.when(
            F.col("v_sum_micro") > 0,
            F.col("oe_sum_micro").cast("double")
            / F.sqrt(F.col("v_sum_micro").cast("double") * F.lit(1e6)),
        ).alias("logrank_z"),
    )


LOGRANK_SQL = """
WITH sign AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), med AS (
  SELECT quantile_cont(date_diff('day', DATE '1970-01-01',
                                 CAST(t0 AS DATE)), 0.5) AS md
  FROM sign
), purch AS (
  SELECT e.user_id, min(e.ts) AS t1
  FROM events e JOIN sign s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t0
  GROUP BY e.user_id
), horizon AS (SELECT max(ts) AS tmax FROM events),
users AS (
  SELECT CAST(coalesce(
           date_diff('day', CAST(s.t0 AS DATE), CAST(p.t1 AS DATE)),
           date_diff('day', CAST(s.t0 AS DATE),
                     CAST((SELECT tmax FROM horizon) AS DATE))
         ) AS BIGINT) AS t,
         p.t1 IS NOT NULL AS is_event,
         CAST(date_diff('day', DATE '1970-01-01', CAST(s.t0 AS DATE))
              AS DOUBLE) <= (SELECT md FROM med) AS early
  FROM sign s LEFT JOIN purch p ON s.user_id = p.user_id
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(CAST(early AS BIGINT)) AS BIGINT) AS n1_total
  FROM users
), per_day AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_at,
         CAST(sum(CAST(early AS BIGINT)) AS BIGINT) AS n1_at,
         CAST(sum(CAST(is_event AS BIGINT)) AS BIGINT) AS d,
         CAST(sum(CAST(is_event AND early AS BIGINT)) AS BIGINT) AS d1
  FROM users GROUP BY t
), spine AS (
  SELECT t, d, d1,
         (SELECT n_total FROM tot)
           - coalesce(sum(n_at) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n,
         (SELECT n1_total FROM tot)
           - coalesce(sum(n1_at) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n1
  FROM per_day
), terms AS (
  SELECT CAST(floor((CAST(d1 AS DOUBLE)
                     - CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)
                       / CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS oe,
         CASE WHEN n > 1 THEN
           CAST(floor((CAST(d AS DOUBLE)
                       * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE)))
                      * 1e6 + 0.5) AS BIGINT)
         ELSE 0 END AS v
  FROM spine WHERE d > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_event_days,
       (SELECT n1_total FROM tot) AS n_early,
       (SELECT n_total - n1_total FROM tot) AS n_late,
       CAST(sum(oe) AS BIGINT) AS oe_sum_micro,
       CAST(sum(v) AS BIGINT) AS v_sum_micro,
       CASE WHEN sum(v) > 0 THEN
         CAST(sum(oe) AS DOUBLE) / sqrt(CAST(sum(v) AS DOUBLE) * 1e6)
       END AS logrank_z
FROM terms
"""

QUERIES["logrank_cohort_test"] = logrank_cohort_test
ORACLES["logrank_cohort_test"] = LOGRANK_SQL


LIFT_BUCKETS = 10


def lift_table_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / cumulative-gains table — the standard evaluation
    of a targeting score: users ranked by engagement score (view
    count as the stand-in model score), cut into deciles, each row
    reporting conversion rate, lift over the base rate, and the
    cumulative share of all converters captured — "top 30% of scores
    capture X% of buyers".

    Determinism: the decile cut is rank arithmetic, not value
    thresholds — row_number ties break on user_id, decile =
    (rank−1)·B // n — so equal scores split reproducibly. Rates and
    lifts ride exact integer products with one final double chain
    (lift in micro units uses integer cross-products; base rate
    divides out exactly).

    Scale: one user-grain aggregate, then a rank window. The global
    rank here is the exact presentation form and this entry's oracle
    ground truth; lift_table_deciles_approx below is the IMPLEMENTED
    100 TB twin (score-grain histogram + broadcast theta cumsum, no
    single-partition window) — run that one at real user
    cardinality."""
    ev = load_table(spark, sf_dir, "events")
    # cached: consumed by the totals pull AND the ranked plan — one
    # fact-table scan, one user-grain shuffle total
    per_user = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("score"),
        F.max((F.col("event_type") == "purchase").cast("long")).alias("conv"),
    ).transform(track_cache)
    # deliberate row-grain global rank: the oracle ground truth whose
    # scale swap IS lift_table_deciles_approx below
    w = Window.orderBy(F.desc("score"), "user_id")
    totals = per_user.agg(
        F.count("*").alias("nu"), F.sum("conv").alias("tc")
    ).collect()[0]
    n_users = int(totals.nu)
    from trace_parquet_spark.operators.scale_hints import (
        warn_if_window_heavy,
    )

    # n_users IS the global rank partition's size — already on the
    # driver, so the hint costs nothing here
    warn_if_window_heavy(
        "lift_table_deciles",
        "lift_table_deciles_approx",
        known_rows=n_users,
    )
    ranked = per_user.select(
        "score",
        "conv",
        F.row_number().over(w).alias("rn"),
    ).select(
        "score",
        "conv",
        F.expr(
            f"CAST((rn - 1) * {LIFT_BUCKETS} div {n_users} AS BIGINT)"
        ).alias("decile"),
    )
    g = ranked.groupBy("decile").agg(
        F.count("*").alias("n_users"),
        F.sum("conv").alias("n_conv"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )
    tot = int(totals.tc or 0)
    # global window is decile-grain bounded: <= LIFT_BUCKETS rows
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        g.withColumn("cum_conv", F.sum("n_conv").over(wc))
        .select(
            "decile",
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_conv").cast("long").alias("n_conv"),
            F.col("min_score").cast("long").alias("min_score"),
            F.col("max_score").cast("long").alias("max_score"),
            (
                F.col("n_conv").cast("double") / F.col("n_users").cast("double")
            ).alias("conv_rate"),
            F.expr(
                f"CAST(n_conv * {n_users} * 1000000"
                f" DIV (n_users * {max(tot, 1)}) AS BIGINT)"
            ).alias("lift_micro"),
            F.expr(
                f"CAST(cum_conv * 1000000 DIV {max(tot, 1)} AS BIGINT)"
            ).alias("cum_gain_ppm"),
        )
        .orderBy("decile")
    )


LIFT_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(event_type = 'view' AS BIGINT)) AS BIGINT) AS score,
         CAST(max(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT) AS conv
  FROM events GROUP BY user_id
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(conv) AS BIGINT) AS tot FROM per_user),
ranked AS (
  SELECT score, conv,
         CAST((row_number() OVER (ORDER BY score DESC, user_id) - 1)
              * {LIFT_BUCKETS} // (SELECT n_users FROM n) AS BIGINT) AS decile
  FROM per_user
), g AS (
  SELECT decile,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(conv) AS BIGINT) AS n_conv,
         CAST(min(score) AS BIGINT) AS min_score,
         CAST(max(score) AS BIGINT) AS max_score
  FROM ranked GROUP BY decile
), c AS (
  SELECT *,
         CAST(sum(n_conv) OVER (ORDER BY decile
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cum_conv
  FROM g
)
SELECT decile, n_users, n_conv, min_score, max_score,
       CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS conv_rate,
       CAST(n_conv * (SELECT n_users FROM n) * 1000000
            // (n_users * greatest((SELECT tot FROM n), 1)) AS BIGINT)
         AS lift_micro,
       CAST(cum_conv * 1000000 // greatest((SELECT tot FROM n), 1) AS BIGINT)
         AS cum_gain_ppm
FROM c
ORDER BY decile
"""

QUERIES["lift_table_deciles"] = lift_table_deciles
ORACLES["lift_table_deciles"] = LIFT_SQL


def lift_table_deciles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of lift_table_deciles (round-6 verdict item 2):
    decile cuts from the SCORE-GRAIN histogram instead of a global
    row_number over user grain. Scores are small integers (view
    counts), so the per-score relation is value-grain-bounded; its
    descending cumulative user count is a broadcast theta self-join
    (score-grain × score-grain), each score group lands wholly in the
    decile of its LAST exact rank — deviation from the exact cut is
    bounded by tie-group size, and the assignment is deterministic, so
    the DuckDB oracle re-derives it hash-identically (the
    equi_depth_price_buckets_approx mechanism applied to the lift
    table). The plan carries NO single-partition WindowExec at any
    size (pinned in tests/test_scale_paths.py); the decile-grain
    cumulative gain is another broadcast theta join over ≤B rows.

    The exact-rank version stays registered as the presentation form;
    at real scale this twin is the one to run."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("score"),
        F.max((F.col("event_type") == "purchase").cast("long")).alias("conv"),
    )
    # score-grain histogram: one more user-grain-to-score-grain agg
    hist = per_user.groupBy("score").agg(
        F.count("*").cast("long").alias("nu"),
        F.sum("conv").cast("long").alias("nc"),
    ).transform(track_cache)
    h2 = hist.select(
        F.col("score").alias("score2"),
        F.col("nu").alias("nu2"),
    )
    # cum_end(score) = #users with score' > score, plus this group —
    # i.e. the exact rank of the group's LAST row under (score DESC)
    cum = (
        hist.join(
            F.broadcast(h2),
            (F.col("score2") > F.col("score"))
            | (F.col("score2") == F.col("score")),
        )
        .groupBy("score", "nu", "nc")
        .agg(F.sum("nu2").alias("cum_end"))
    )
    totals = hist.agg(
        F.sum("nu").alias("n_users"),
        F.greatest(F.sum("nc"), F.lit(1)).alias("tot"),
    )
    bucketed = cum.crossJoin(F.broadcast(totals)).select(
        F.expr(f"CAST((cum_end - 1) * {LIFT_BUCKETS} div n_users AS BIGINT)")
        .alias("decile"),
        "score",
        "nu",
        "nc",
        "n_users",
        "tot",
    )
    g = bucketed.groupBy("decile", "n_users", "tot").agg(
        F.sum("nu").cast("long").alias("n_users_d"),
        F.sum("nc").cast("long").alias("n_conv"),
        F.min("score").cast("long").alias("min_score"),
        F.max("score").cast("long").alias("max_score"),
    )
    g2 = g.select(
        F.col("decile").alias("decile2"), F.col("n_conv").alias("nc2")
    )
    return (
        g.join(F.broadcast(g2), F.col("decile2") <= F.col("decile"))
        .groupBy(
            "decile", "n_users", "tot", "n_users_d", "n_conv",
            "min_score", "max_score",
        )
        .agg(F.sum("nc2").alias("cum_conv"))
        .select(
            "decile",
            F.col("n_users_d").alias("n_users"),
            "n_conv",
            "min_score",
            "max_score",
            (
                F.col("n_conv").cast("double")
                / F.col("n_users_d").cast("double")
            ).alias("conv_rate"),
            F.expr(
                "CAST(n_conv * n_users * 1000000"
                " DIV (n_users_d * tot) AS BIGINT)"
            ).alias("lift_micro"),
            F.expr("CAST(cum_conv * 1000000 DIV tot AS BIGINT)").alias(
                "cum_gain_ppm"
            ),
        )
        .orderBy("decile")
    )


LIFT_APPROX_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(event_type = 'view' AS BIGINT)) AS BIGINT) AS score,
         CAST(max(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT) AS conv
  FROM events GROUP BY user_id
), hist AS (
  SELECT score, CAST(count(*) AS BIGINT) AS nu,
         CAST(sum(conv) AS BIGINT) AS nc
  FROM per_user GROUP BY score
), n AS (
  SELECT CAST(sum(nu) AS BIGINT) AS n_users,
         greatest(CAST(sum(nc) AS BIGINT), 1) AS tot
  FROM hist
), cum AS (
  SELECT score, nu, nc,
         CAST(sum(nu) OVER (ORDER BY score DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS cum_end
  FROM hist
), bucketed AS (
  SELECT CAST((cum_end - 1) * {LIFT_BUCKETS}
              // (SELECT n_users FROM n) AS BIGINT) AS decile,
         score, nu, nc
  FROM cum
), g AS (
  SELECT decile,
         CAST(sum(nu) AS BIGINT) AS n_users,
         CAST(sum(nc) AS BIGINT) AS n_conv,
         CAST(min(score) AS BIGINT) AS min_score,
         CAST(max(score) AS BIGINT) AS max_score
  FROM bucketed GROUP BY decile
), c AS (
  SELECT *,
         CAST(sum(n_conv) OVER (ORDER BY decile
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cum_conv
  FROM g
)
SELECT decile, n_users, n_conv, min_score, max_score,
       CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS conv_rate,
       CAST(n_conv * (SELECT n_users FROM n) * 1000000
            // (n_users * (SELECT tot FROM n)) AS BIGINT) AS lift_micro,
       CAST(cum_conv * 1000000 // (SELECT tot FROM n) AS BIGINT)
         AS cum_gain_ppm
FROM c
ORDER BY decile
"""

QUERIES["lift_table_deciles_approx"] = lift_table_deciles_approx
ORACLES["lift_table_deciles_approx"] = LIFT_APPROX_SQL


def score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the engagement score as a converter classifier —
    the threshold-free companion to lift_table_deciles, computed
    exactly as the Mann-Whitney statistic with MIDRANKS for ties:
    AUC = (Σ ranks⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻).

    Everything lives on the SCORE-GRAIN spine (cardinality-bounded —
    the KS/PSI discipline): per score value, positives and totals;
    midranks in half-units keep the tie adjustment integer
    (2·rank = 2·cum_below + cnt + 1), so the AUC numerator and
    denominator are exact int64 and the ratio is one double chain.
    Never a per-row rank window.

    Scale: one user-grain aggregate, one score-grain aggregate, a
    bounded-spine cumsum — three shuffles, none row-ranked."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("score"),
        F.max((F.col("event_type") == "purchase").cast("long")).alias("conv"),
    )
    g = per_user.groupBy("score").agg(
        F.count("*").alias("nt"),
        F.sum("conv").alias("np"),
    )
    # global window is score-grain bounded: |g| = distinct view-count
    # values (the value grid), never user grain
    wv = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    spine = g.select(
        "score",
        "nt",
        "np",
        F.coalesce(F.sum("nt").over(wv), F.lit(0)).alias("cum_below"),
    )
    dec = "decimal(38,0)"
    sums = spine.agg(
        F.sum("np").alias("n_pos"),
        F.sum(F.col("nt") - F.col("np")).alias("n_neg"),
        F.sum(
            F.col("np").cast(dec)
            * (F.lit(2) * F.col("cum_below") + F.col("nt") + 1)
        ).alias("r2"),
    )
    n_pos, n_neg = F.col("n_pos"), F.col("n_neg")
    num2 = (F.col("r2") - n_pos.cast(dec) * (n_pos + 1)).cast("long")
    den2 = (F.lit(2).cast(dec) * n_pos * n_neg).cast("long")
    return sums.select(
        n_pos.cast("long").alias("n_pos"),
        n_neg.cast("long").alias("n_neg"),
        num2.alias("auc_num2"),
        den2.alias("auc_den2"),
        F.when(
            (n_pos > 0) & (n_neg > 0),
            num2.cast("double") / den2.cast("double"),
        ).alias("auc"),
    )


SCORE_AUC_SQL = """
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(event_type = 'view' AS BIGINT)) AS BIGINT) AS score,
         CAST(max(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT) AS conv
  FROM events GROUP BY user_id
), g AS (
  SELECT score, CAST(count(*) AS BIGINT) AS nt,
         CAST(sum(conv) AS BIGINT) AS np
  FROM per_user GROUP BY score
), spine AS (
  SELECT score, nt, np,
         coalesce(sum(nt) OVER (ORDER BY score
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cum_below
  FROM g
), sums AS (
  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
         CAST(sum(nt - np) AS BIGINT) AS n_neg,
         sum(CAST(np AS HUGEINT) * (2 * cum_below + nt + 1)) AS r2
  FROM spine
)
SELECT n_pos, n_neg,
       CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT) AS auc_num2,
       CAST(2 * CAST(n_pos AS HUGEINT) * n_neg AS BIGINT) AS auc_den2,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         CAST(CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT)
              AS DOUBLE)
           / CAST(CAST(2 * CAST(n_pos AS HUGEINT) * n_neg AS BIGINT)
                  AS DOUBLE)
       END AS auc
FROM sums
"""

QUERIES["score_auc"] = score_auc
ORACLES["score_auc"] = SCORE_AUC_SQL


def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard for signup→purchase conversion —
    KM's additive sibling: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ estimates cumulative
    conversion PRESSURE, and unlike Ŝ it needs no exp — every term is
    one integer division on the micro grid ((d·1e6) DIV n) and the
    curve is a window sum of integers: the whole estimator is exact
    integer arithmetic end-to-end, no float anywhere.

    Shares kaplan_meier_conversion's censoring construction and
    day-grain spine; same scale shape."""
    ev = load_table(spark, sf_dir, "events")
    tmax = ev.agg(F.max("ts")).collect()[0][0]
    sign = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(sign, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    users = sign.join(purch, "user_id", "left").select(
        F.coalesce(
            F.datediff(F.to_date("t1"), F.to_date("t0")),
            F.datediff(F.to_date(F.lit(tmax)), F.to_date("t0")),
        ).cast("long").alias("t"),
        F.col("t1").isNotNull().alias("is_event"),
    )
    per_day = users.groupBy("t").agg(
        F.count("*").alias("n_at"),
        F.sum(F.col("is_event").cast("long")).alias("d"),
    ).transform(track_cache)
    n_total = per_day.agg(F.sum("n_at")).collect()[0][0] or 0
    # global windows are day-spine bounded: one row per calendar day
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    spine = per_day.withColumn(
        "n_risk", F.lit(n_total) - F.coalesce(F.sum("n_at").over(wcum), F.lit(0))
    ).where(F.col("d") > 0)
    wsum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.withColumn(
            "haz_term_micro",
            F.expr("CAST(d * 1000000 DIV n_risk AS BIGINT)"),
        )
        .select(
            F.col("t").alias("t_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("d_events"),
            "haz_term_micro",
            F.sum("haz_term_micro").over(wsum).cast("long").alias(
                "cum_hazard_micro"
            ),
        )
        .orderBy("t_days")
    )


NELSON_AALEN_SQL = """
WITH sign AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), purch AS (
  SELECT e.user_id, min(e.ts) AS t1
  FROM events e JOIN sign s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t0
  GROUP BY e.user_id
), horizon AS (SELECT max(ts) AS tmax FROM events),
users AS (
  SELECT CAST(coalesce(
           date_diff('day', CAST(s.t0 AS DATE), CAST(p.t1 AS DATE)),
           date_diff('day', CAST(s.t0 AS DATE),
                     CAST((SELECT tmax FROM horizon) AS DATE))
         ) AS BIGINT) AS t,
         p.t1 IS NOT NULL AS is_event
  FROM sign s LEFT JOIN purch p ON s.user_id = p.user_id
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM users),
per_day AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_at,
         CAST(sum(CAST(is_event AS BIGINT)) AS BIGINT) AS d
  FROM users GROUP BY t
), spine AS (
  SELECT t, d,
         (SELECT n_total FROM n)
           - coalesce(sum(n_at) OVER (ORDER BY t
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS n_risk
  FROM per_day
), ev_days AS (
  SELECT t, n_risk, d,
         CAST(d * 1000000 // n_risk AS BIGINT) AS haz_term_micro
  FROM spine WHERE d > 0
)
SELECT t AS t_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       d AS d_events,
       haz_term_micro,
       CAST(sum(haz_term_micro) OVER (ORDER BY t
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT)
         AS cum_hazard_micro
FROM ev_days
ORDER BY t_days
"""

QUERIES["nelson_aalen_hazard"] = nelson_aalen_hazard
ORACLES["nelson_aalen_hazard"] = NELSON_AALEN_SQL
