"""Temporal operator queries: sessionization, as-of join, time windows.

Thin (spark, sf_dir) wrappers around the operators in
``operators/{sessionize,asof,time_rollup}.py`` with their DuckDB
oracles. All oracles CAST(ts AS TIMESTAMP) — see plans/relational.py
header for the TIMESTAMP(NANOS) story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join_backward
from ..operators.sessionize import SESSION_STATS_SQL_TEMPLATE, session_stats
from ..operators.time_rollup import (
    SESSION_WINDOW_SQL,
    SLIDING_SQL,
    TUMBLING_SQL,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from ..sources.registry import load_table


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_stats(ev, key="user_id", ts="ts", gap_minutes=30)


def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent click at-or-before
    the purchase time (backward as-of join, union-window plan)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    joined = asof_join_backward(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "ts"],
        tiebreak="event_id",
        inner=True,
    )
    return joined.select(
        "user_id",
        "event_id",
        "ts",
        F.col("asof_event_id").alias("click_event_id"),
        F.col("asof_ts").alias("click_ts"),
    ).orderBy("user_id", "event_id")


ASOF_SQL = """
WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click')
SELECT user_id, event_id, ts, click_event_id, click_ts
FROM (
  SELECT p.user_id, p.event_id, p.ts,
         c.event_id AS click_event_id, c.ts AS click_ts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
)
WHERE rn = 1
ORDER BY user_id, event_id
"""


def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_window_agg(load_table(spark, sf_dir, "events"))


def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_window_agg(load_table(spark, sf_dir, "events"))


def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_agg(load_table(spark, sf_dir, "events"))


def max_daily_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent active users per day, by sweep line: each
    user's daily activity interval [min ts, max ts] contributes a +1
    at its start and a -1 at its end; the running sum over the
    day-partitioned, (ts, delta DESC)-ordered point stream peaks at
    the answer. Touching intervals count as overlapping (+1 sorts
    before -1 at the same instant), and the default RANGE window frame
    lumps equal sort keys together, which both makes the running sum
    well-defined under ties and is implemented identically by Spark
    and DuckDB.

    Scale: intervals collapse events per (user, day) in one partial
    agg; the sweep is a window WITHIN each day partition — no global
    ordering anywhere, days parallelize freely.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", F.to_date("ts").alias("day")
    )
    iv = ev.groupBy("user_id", "day").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    points = iv.select(
        "day", F.col("s").alias("pts"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("day", F.col("e").alias("pts"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("day").orderBy(F.col("pts"), F.col("delta").desc())
    )
    running = points.withColumn("conc", F.sum("delta").over(w))
    return (
        running.groupBy("day")
        .agg(F.max("conc").cast("long").alias("peak_concurrency"))
        .select(F.col("day").cast("timestamp").alias("day"), "peak_concurrency")
        .orderBy("day")
    )


CONCURRENCY_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
), iv AS (
  SELECT user_id, day, min(ts) AS s, max(ts) AS e
  FROM ev GROUP BY user_id, day
), points AS (
  SELECT day, s AS pts, 1 AS delta FROM iv
  UNION ALL
  SELECT day, e AS pts, -1 AS delta FROM iv
), swept AS (
  SELECT day,
         sum(delta) OVER (PARTITION BY day ORDER BY pts, delta DESC) AS conc
  FROM points
)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(max(conc) AS BIGINT) AS peak_concurrency
FROM swept
GROUP BY day
ORDER BY day
"""


ATTR_WINDOW_US = 7 * 86_400 * 1_000_000  # 7-day lookback, epoch-µs grid


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style last-touch attribution: every purchase credits
    its revenue to the user's most recent preceding non-purchase event
    (the "touch") within a 7-day lookback; purchases with no touch in
    the window are 'direct'. Output: revenue and purchase count per
    attributed channel.

    Single window pass, no events⋈events self-join (the same
    no-self-join discipline as pit_features_7d): per user, in (ts,
    event_id) order, carry the last non-purchase (ts, type) forward
    with last(..., ignoreNulls) over rows [unbounded, -1] — the -1
    bound excludes the current row, so a purchase can never attribute
    to itself even under timestamp ties. Window recency is compared on
    the exact epoch-µs grid (unix_micros / epoch_us in the oracle).

    Scale: one shuffle on user_id for the window, then a 5-row agg;
    revenue stays exact integer cents."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(
                F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("tus"),
                F.col("event_type").alias("tt"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    attributed = (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("touch").isNotNull()
                & (
                    F.unix_micros(F.col("ts").cast("timestamp_ltz")) - F.col("touch.tus")
                    <= F.lit(ATTR_WINDOW_US)
                ),
                F.col("touch.tt"),
            )
            .otherwise(F.lit("direct"))
            .alias("channel"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    return (
        attributed.groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("channel")
    )


ATTRIBUTION_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
  FROM events
), touched AS (
  SELECT event_id, event_type, value, epoch_us(ts) AS pus,
         last_value(CASE WHEN event_type <> 'purchase'
                         THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tus,
         last_value(CASE WHEN event_type <> 'purchase'
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tt
  FROM ev
)
SELECT CASE WHEN tus IS NOT NULL AND pus - tus <= {ATTR_WINDOW_US}
            THEN tt ELSE 'direct' END AS channel,
       count(*) AS n_purchases,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM touched
WHERE event_type = 'purchase'
GROUP BY 1
ORDER BY channel
"""


QUERIES = {
    "sessionize_events": sessionize_events,
    "asof_click_before_purchase": asof_click_before_purchase,
    "tumbling_window_events": tumbling_window_events,
    "sliding_window_events": sliding_window_events,
    "session_window_events": session_window_events,
    "max_daily_concurrency": max_daily_concurrency,
    "attribution_last_touch": attribution_last_touch,
}

ORACLES = {
    "sessionize_events": SESSION_STATS_SQL_TEMPLATE.format(gap_seconds=30 * 60),
    "asof_click_before_purchase": ASOF_SQL,
    "tumbling_window_events": TUMBLING_SQL,
    "sliding_window_events": SLIDING_SQL,
    "session_window_events": SESSION_WINDOW_SQL,
    "max_daily_concurrency": CONCURRENCY_SQL,
    "attribution_last_touch": ATTRIBUTION_SQL,
}


BURST_GAP_US = 3_000_000  # 3s on the exact epoch-µs grid


def burst_collapse_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry burst collapse — the TEMPORAL dedup flavor: retries
    and double-fires produce runs of near-identical events; collapse
    each run of same (user, type) events with inter-event gaps ≤ 3 s
    into one surviving record (the burst's first event) plus the
    burst's size and span. Gaps-and-islands: a burst starts where the
    gap from the previous event exceeds the threshold; the running sum
    of start flags numbers the bursts — two window passes over one
    (user_id, event_type) shuffle, no self-join, exact µs integers
    everywhere.

    Scale: identical shape to sessionization (the proven one-shuffle
    island kernel); burst grain aggregation is a pure restriction of
    the windowed relation."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts"
    )
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    marked = (
        ev.withColumn("us", us)
        .withColumn("prev_us", F.lag("us").over(w))
        .withColumn(
            "new_burst",
            (
                F.col("prev_us").isNull()
                | (F.col("us") - F.col("prev_us") > BURST_GAP_US)
            ).cast("long"),
        )
        .withColumn("burst_id", F.sum("new_burst").over(wrun))
    )
    return (
        marked.groupBy("user_id", "event_type", "burst_id")
        .agg(
            F.min(F.struct("ts", "event_id")).alias("first"),
            F.count("*").cast("long").alias("n_events"),
            (F.max("us") - F.min("us")).cast("long").alias("span_us"),
        )
        .select(
            "user_id",
            "event_type",
            "burst_id",
            F.col("first.event_id").alias("keep_event_id"),
            F.col("first.ts").alias("burst_start"),
            "n_events",
            "span_us",
        )
        .orderBy("user_id", "event_type", "burst_id")
    )


BURST_COLLAPSE_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
), marked AS (
  SELECT *,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {BURST_GAP_US}
              THEN 1 ELSE 0 END AS new_burst
  FROM ev
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
), numbered AS (
  SELECT *,
         CAST(sum(new_burst) OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS burst_id
  FROM marked
)
SELECT user_id, event_type, burst_id,
       first(event_id ORDER BY ts, event_id) AS keep_event_id,
       min(ts) AS burst_start,
       count(*) AS n_events,
       CAST(max(us) - min(us) AS BIGINT) AS span_us
FROM numbered
GROUP BY user_id, event_type, burst_id
ORDER BY user_id, event_type, burst_id
"""

QUERIES["burst_collapse_events"] = burst_collapse_events
ORACLES["burst_collapse_events"] = BURST_COLLAPSE_SQL


def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — the fairness twin of
    attribution_last_touch: every purchase splits its revenue EQUALLY
    across all preceding non-purchase touches inside the 7-day
    lookback (no touch → 'direct'). Credits stay on the exact
    micro-cent integer grid: each touch gets cents·10⁶ DIV n and the
    division remainder goes to the MOST RECENT touch, so per-purchase
    credits always sum exactly to cents·10⁶ — the books balance to
    the micro-cent by construction.

    Plan: per-user window collects the preceding touch structs (rows
    [unbounded, −1] — strictly before, so a purchase never credits
    itself even under timestamp ties), a higher-order filter keeps
    the lookback, posexplode fans credits out, one agg by channel.
    Array length is bounded by a USER's 7-day activity (the same
    per-user-partition assumption every window here makes) — no
    events⋈events self-join anywhere.

    Oracle: a genuinely different derivation — the literal
    purchase⋈touch join with per-purchase count/recency windows —
    which must land on identical channel totals."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touches = F.collect_list(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(
                F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("tus"),
                F.col("event_type").alias("tt"),
            ),
        )
    ).over(w)
    pus = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    p = (
        ev.withColumn("touch_hist", touches)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            F.filter(
                F.col("touch_hist"),
                lambda t: t["tus"] >= pus - F.lit(ATTR_WINDOW_US),
            ).alias("win_touches"),
        )
        .withColumn("n", F.size("win_touches").cast("long"))
    )
    direct = p.filter(F.col("n") == 0).select(
        F.lit("direct").alias("channel"),
        (F.col("cents") * 1_000_000).alias("credit_micro"),
    )
    credited = (
        p.filter(F.col("n") > 0)
        .select(
            "p_id", "cents", "n", F.posexplode("win_touches").alias("idx", "t")
        )
        .select(
            F.col("t.tt").alias("channel"),
            (
                F.expr("cents * 1000000 DIV n")
                + F.when(
                    F.col("idx") == F.col("n") - 1,
                    F.expr("(cents * 1000000) % n"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("credit_micro"),
        )
    )
    return (
        credited.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_credits"),
            F.sum("credit_micro").cast("long").alias("credit_micro_total"),
        )
        .orderBy("channel")
    )


ATTRIBUTION_LINEAR_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
), p AS (
  SELECT event_id AS p_id, user_id, ts, us AS pus,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM ev WHERE event_type = 'purchase'
), t AS (
  SELECT event_id, user_id, ts, us AS tus, event_type AS tt
  FROM ev WHERE event_type <> 'purchase'
), pairs AS (
  SELECT p.p_id, p.cents, t.tt,
         row_number() OVER (PARTITION BY p.p_id
                            ORDER BY t.ts DESC, t.event_id DESC) AS rdesc,
         count(*) OVER (PARTITION BY p.p_id) AS n
  FROM p JOIN t
    ON t.user_id = p.user_id
   AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.p_id))
   AND t.tus >= p.pus - {ATTR_WINDOW_US}
), credited AS (
  SELECT tt AS channel,
         CAST(cents * 1000000 // n
              + CASE WHEN rdesc = 1 THEN (cents * 1000000) % n ELSE 0 END
              AS BIGINT) AS credit_micro
  FROM pairs
), direct AS (
  SELECT 'direct' AS channel,
         CAST(cents * 1000000 AS BIGINT) AS credit_micro
  FROM p WHERE NOT EXISTS (SELECT 1 FROM pairs WHERE pairs.p_id = p.p_id)
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_credits,
       CAST(sum(credit_micro) AS BIGINT) AS credit_micro_total
FROM (SELECT * FROM credited UNION ALL SELECT * FROM direct)
GROUP BY channel
ORDER BY channel
"""

QUERIES["attribution_linear"] = attribution_linear
ORACLES["attribution_linear"] = ATTRIBUTION_LINEAR_SQL


# ---------------------------------------------------------------------------
# Markov-chain (removal-effect) attribution
# ---------------------------------------------------------------------------

MARKOV_SCALE = 10**6
MARKOV_ITERS = 40
MARKOV_CHANNELS = ("click", "error", "signup", "view")


def _markov_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, cnt) over user journeys: START → first touch,
    channel → next touch, purchase mapped to the absorbing 'conv',
    unconverted journey ends → absorbing 'null'. Distributed: one
    user-partitioned window pass over events truncated at the first
    purchase; the output is (channels+1)×(channels+2) rows at most."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.row_number().over(w))
        )
        .over(Window.partitionBy("user_id"))
        .alias("conv_rn"),
    )
    journey = ranked.where(
        F.col("conv_rn").isNull() | (F.col("rn") <= F.col("conv_rn"))
    ).select(
        "user_id",
        "rn",
        F.when(F.col("event_type") == "purchase", "conv")
        .otherwise(F.col("event_type"))
        .alias("state"),
    )
    wj = Window.partitionBy("user_id").orderBy("rn")
    stepped = journey.select(
        "user_id",
        "rn",
        "state",
        F.lead("state").over(wj).alias("nxt"),
    )
    starts = stepped.where(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("state").alias("dst")
    )
    steps = stepped.where(F.col("state") != "conv").select(
        F.col("state").alias("src"),
        F.coalesce(F.col("nxt"), F.lit("null")).alias("dst"),
    )
    return (
        starts.unionAll(steps)
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _markov_absorb(cnt_rows, removed: str | None) -> int:
    """Exact integer K-round absorption probability (scaled) of
    reaching 'conv' from START; transitions INTO ``removed`` are
    redirected to 'null' (numerator drops them, denominators keep the
    full out-mass — the standard removal effect)."""
    from collections import defaultdict

    cnt: dict = defaultdict(dict)
    out: dict = defaultdict(int)
    for src, dst, c in cnt_rows:
        cnt[src][dst] = c
        out[src] += c
    states = set(out)
    v = {s: 0 for s in states}
    for _ in range(MARKOV_ITERS):
        nv = {}
        for s in states:
            acc = 0
            for dst, c in cnt[s].items():
                if removed is not None and dst == removed:
                    continue
                if dst == "conv":
                    acc += c * MARKOV_SCALE
                elif dst == "null":
                    continue
                else:
                    acc += c * v.get(dst, 0)
            nv[s] = acc // out[s]
        v = nv
    return v.get("START", 0)


def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain attribution by removal effect — the third model
    next to attribution_last_touch and attribution_linear, and the
    only one that credits channels by their CAUSAL role in the journey
    graph rather than by position: conversion probability is computed
    from the START state of the journey Markov chain, then re-computed
    with each channel removed (its inbound transitions redirected to
    the null absorber); the drop is the channel's removal effect, and
    credit shares normalize those drops.

    Exactness: transition counts are distributed integers; absorption
    runs MARKOV_ITERS synchronous rounds of integer arithmetic on the
    MARKOV_SCALE grid (floor division each round — monotone from
    below, K fixed, so both engines land identical integers; the
    oracle unrolls the same rounds as MATERIALIZED CTEs, the pagerank
    pattern). 40 rounds bounds the truncation under the slowest
    journey mixing seen in the fixtures (residual < 1%; the exact
    linear-solve comparison is pytest-pinned).

    Scale: the single data-sized pass is the user-partitioned journey
    window; the chain itself is (channels+1)×(channels+2) counts —
    a model-sized driver pull (centroid discipline), and 5 scenarios
    × 40 rounds of 6×6 integer arithmetic is nanoseconds anywhere."""
    cnt_rows = [
        (r["src"], r["dst"], int(r["cnt"]))
        for r in _markov_transition_counts(spark, sf_dir).collect()
    ]
    known = set(MARKOV_CHANNELS) | {"START", "conv", "null"}
    seen = {s for s, _, _ in cnt_rows} | {d for _, d, _ in cnt_rows}
    if not seen <= known:
        # the unrolled oracle enumerates exactly these states; a new
        # event type must be added to MARKOV_CHANNELS, not silently
        # valued 0 on one engine only
        raise ValueError(f"unknown journey states: {sorted(seen - known)}")
    base = _markov_absorb(cnt_rows, None)
    effects = []
    for ch in MARKOV_CHANNELS:
        removed = _markov_absorb(cnt_rows, ch)
        effects.append((ch, base, removed, base - removed))
    tot_eff = sum(e for _, _, _, e in effects)
    rows = [
        (
            ch,
            b,
            r,
            e,
            (e * 1_000_000 // tot_eff) if tot_eff > 0 else None,
        )
        for ch, b, r, e in effects
    ]
    return spark.createDataFrame(
        rows,
        "channel string, base_conv_micro long, removed_conv_micro long, "
        "effect_micro long, weight_ppm long",
    ).orderBy("channel")


def _markov_sql() -> str:
    states = ("START",) + MARKOV_CHANNELS

    def val(k: int, scen: str, dst_expr: str) -> str:
        """value of dst in round k−1 under scenario scen."""
        removed = f"WHEN {dst_expr} = '{scen}' THEN 0" if scen != "base" else ""
        prev = " ".join(
            f"WHEN {dst_expr} = '{s}' THEN"
            f" (SELECT v FROM v_{scen}_{k - 1} WHERE state = '{s}')"
            for s in states
        )
        return f"""CASE WHEN {dst_expr} = 'conv' THEN {MARKOV_SCALE}
             WHEN {dst_expr} = 'null' THEN 0 {removed} {prev} ELSE 0 END"""

    ctes = []
    scens = ["base"] + list(MARKOV_CHANNELS)
    for scen in scens:
        ctes.append(
            f"""v_{scen}_0 AS MATERIALIZED (
  SELECT unnest(['{"', '".join(states)}']) AS state, CAST(0 AS BIGINT) AS v
)"""
        )
        for k in range(1, MARKOV_ITERS + 1):
            ctes.append(
                f"""v_{scen}_{k} AS MATERIALIZED (
  SELECT o.src AS state,
         CAST(coalesce(sum(c.cnt * ({val(k, scen, "c.dst")})), 0)
              // o.outc AS BIGINT) AS v
  FROM outs o LEFT JOIN cnt c ON c.src = o.src
  GROUP BY o.src, o.outc
)"""
            )
    finals = "\n  UNION ALL ".join(
        f"""SELECT '{ch}' AS channel,
       (SELECT v FROM v_base_{MARKOV_ITERS} WHERE state = 'START')
         AS base_conv_micro,
       (SELECT v FROM v_{ch}_{MARKOV_ITERS} WHERE state = 'START')
         AS removed_conv_micro"""
        for ch in MARKOV_CHANNELS
    )
    return f"""
WITH rn0 AS MATERIALIZED (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), ranked AS MATERIALIZED (
  SELECT user_id, event_type, rn,
         min(CASE WHEN event_type = 'purchase' THEN rn END)
           OVER (PARTITION BY user_id) AS conv_rn
  FROM rn0
), journey AS MATERIALIZED (
  SELECT user_id, rn,
         CASE WHEN event_type = 'purchase' THEN 'conv'
              ELSE event_type END AS state
  FROM ranked
  WHERE conv_rn IS NULL OR rn <= conv_rn
), stepped AS MATERIALIZED (
  SELECT user_id, rn, state,
         lead(state) OVER (PARTITION BY user_id ORDER BY rn) AS nxt
  FROM journey
), trans AS MATERIALIZED (
  SELECT 'START' AS src, state AS dst FROM stepped WHERE rn = 1
  UNION ALL
  SELECT state AS src, coalesce(nxt, 'null') AS dst
  FROM stepped WHERE state <> 'conv'
), cnt AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt
  FROM trans GROUP BY src, dst
), outs AS MATERIALIZED (
  SELECT src, CAST(sum(cnt) AS BIGINT) AS outc FROM cnt GROUP BY src
),
{','.join(ctes)},
f AS (
  {finals}
), tot AS (
  SELECT sum(base_conv_micro - removed_conv_micro) AS te FROM f
)
SELECT channel,
       CAST(base_conv_micro AS BIGINT) AS base_conv_micro,
       CAST(removed_conv_micro AS BIGINT) AS removed_conv_micro,
       CAST(base_conv_micro - removed_conv_micro AS BIGINT) AS effect_micro,
       CASE WHEN (SELECT te FROM tot) > 0
            THEN CAST((base_conv_micro - removed_conv_micro) * 1000000
                      // (SELECT te FROM tot) AS BIGINT)
       END AS weight_ppm
FROM f
ORDER BY channel
"""


QUERIES["attribution_markov_removal"] = attribution_markov_removal
ORACLES["attribution_markov_removal"] = _markov_sql()
