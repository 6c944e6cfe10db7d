"""Fifth relational batch: time-series gap-fill/resample, analytic
window suite (ntile/percent_rank/cume_dist/lag-delta), and value
histograms — the telemetry-dashboard shapes a trace store serves
(reference data model is interval sensor readings; SURVEY §1.1).

Conventions as in plans/relational.py. ts casts per the
TIMESTAMP(NANOS) rule (memory: oracle-parity-rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import money_sum

from ..sources.registry import load_table

GAPFILL_USER_MAX = 20
HIST_LO, HIST_HI, HIST_BUCKETS = 900, 1000, 10


def gapfill_daily_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularized daily per-user series: missing days between each
    user's first and last activity appear with zero counts (the
    resample/gap-fill primitive every time-series rollup needs).

    Scale shape: the dense day spine is generated per user from a
    2-column aggregate (sequence + explode — rows ∝ users × span
    days, never materialized on the driver) and the left join back to
    the daily aggregate is key-partitioned; nothing is quadratic.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < GAPFILL_USER_MAX
    )
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        money_sum("value").alias("total_value"),
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            # emitted as midnight timestamps: pandas maps Spark DATE to
            # python date objects, which the driver canonicalizer hashes
            # differently from DuckDB's datetime64 DATE column
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
        .orderBy("user_id", "day")
    )


GAPFILL_SQL = f"""
WITH daily AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         count(*) AS n_events, (CAST(sum(CAST(round((value) * 100) AS BIGINT)) AS DOUBLE) / 100) AS total_value
  FROM events WHERE user_id < {GAPFILL_USER_MAX}
  GROUP BY 1, 2
),
span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
)
SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day,
       coalesce(d.n_events, 0)      AS n_events,
       coalesce(d.total_value, 0.0) AS total_value
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
ORDER BY s.user_id, s.day
"""


def window_analytics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic window family in one query: ntile
    quartiles, percent_rank, cume_dist, and lag-delta, all over the
    same per-customer partition (one Exchange serves all four)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 50
    )
    by_price = Window.partitionBy("o_custkey").orderBy(
        "o_totalprice", "o_orderkey"
    )
    by_date = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.ntile(4).over(by_price).cast("long").alias("price_quartile"),
            F.percent_rank().over(by_price).alias("price_pct_rank"),
            F.cume_dist().over(by_price).alias("price_cume_dist"),
            F.round(
                F.col("o_totalprice")
                - F.lag("o_totalprice", 1, 0.0).over(by_date),
                2,
            ).alias("delta_vs_prev_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_SUITE_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ntile(4) OVER w_price AS BIGINT) AS price_quartile,
       percent_rank() OVER w_price           AS price_pct_rank,
       cume_dist()    OVER w_price           AS price_cume_dist,
       round(o_totalprice - lag(o_totalprice, 1, 0.0) OVER w_date, 2)
                                             AS delta_vs_prev_order
FROM orders
WHERE o_custkey < 50
WINDOW w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
       w_date  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


def histogram_part_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram via explicit bucket arithmetic
    (identical floor expression in both engines; DuckDB lacks
    width_bucket). Equal-width histograms are one aggregation pass —
    the profiling primitive for choosing partition bounds at scale."""
    width = (HIST_HI - HIST_LO) / HIST_BUCKETS
    bucket = F.least(
        F.floor((F.col("p_retailprice") - HIST_LO) / F.lit(width)) + 1,
        F.lit(HIST_BUCKETS),
    ).cast("long")
    return (
        load_table(spark, sf_dir, "part")
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.min("p_retailprice"), 2).alias("lo"),
            F.round(F.max("p_retailprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


HISTOGRAM_SQL = f"""
SELECT CAST(least(floor((p_retailprice - {HIST_LO}) / {(HIST_HI - HIST_LO) / HIST_BUCKETS!r}) + 1,
                  {HIST_BUCKETS}) AS BIGINT) AS bucket,
       count(*) AS n_parts,
       round(min(p_retailprice), 2) AS lo,
       round(max(p_retailprice), 2) AS hi
FROM part
GROUP BY 1
ORDER BY bucket
"""


def locf_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: readings voided by a quality
    rule (here: 'error' events) are filled from the user's most recent
    valid reading — the null-handling workhorse for sensor/trace
    streams (the reference's data model, SURVEY §1.1). Exercises
    deterministic NULL creation, last_value(ignoreNulls) frames, and
    NULL-last ordering semantics."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < GAPFILL_USER_MAX
    )
    voided = ev.withColumn(
        "v",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .otherwise(F.col("value")),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        voided.select(
            "user_id",
            "event_id",
            "v",
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        )
        .orderBy("user_id", "event_id")
    )


LOCF_SQL = f"""
SELECT user_id, event_id, v,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
FROM (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
  FROM events WHERE user_id < {GAPFILL_USER_MAX}
)
ORDER BY user_id, event_id
"""


WAU_DAYS = 7


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU, rolling 7-day WAU, and DAU/WAU stickiness per day — the
    product-analytics staple whose naive form is a rolling COUNT
    DISTINCT (not decomposable over a window frame).

    Exact distributed form with CONSTANT fan-out: dedup events to
    (user, day) once, then each active day d covers the 7 report days
    [d, d+6] — explode to (user, covered_day), dedup again, count.
    Every step is a hash aggregation; the expansion factor is exactly
    WAU_DAYS regardless of data size, so the plan survives any
    scale-up (contrast: a day×day range join grows with days²; a
    window over per-user day arrays grows with user history).
    Stickiness is an exact integer per-mille. Report days are clipped
    to the observed day range so trailing partial windows don't leak
    past the data."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    user_days = ev.distinct()
    bounds = user_days.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    covered = (
        user_days.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.date_add(F.col("day"), WAU_DAYS - 1),
                )
            ).alias("rday"),
        )
        .distinct()
        .groupBy("rday")
        .agg(F.count("*").cast("long").alias("wau"))
    )
    dau = user_days.groupBy("day").agg(
        F.count("*").cast("long").alias("dau")
    )
    return (
        covered.join(dau, covered.rday == dau.day, "inner")
        .join(F.broadcast(bounds))
        .filter(F.col("rday").between(F.col("lo"), F.col("hi")))
        .select(
            F.col("rday").cast("timestamp").alias("day"),
            "dau",
            "wau",
            (F.col("dau") * 1000 / F.col("wau"))
            .cast("long")
            .alias("stickiness_mille"),
        )
        .orderBy("day")
    )


ROLLING_ACTIVE_SQL = f"""
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
), bounds AS (
  SELECT min(day) AS lo, max(day) AS hi FROM user_days
), covered AS (
  SELECT DISTINCT user_id, day + CAST(off AS INTEGER) AS rday
  FROM user_days, unnest(generate_series(0, {WAU_DAYS - 1})) AS t(off)
), wau AS (
  SELECT rday, count(*) AS wau FROM covered GROUP BY rday
), dau AS (
  SELECT day, count(*) AS dau FROM user_days GROUP BY day
)
SELECT CAST(w.rday AS TIMESTAMP) AS day,
       CAST(d.dau AS BIGINT) AS dau,
       CAST(w.wau AS BIGINT) AS wau,
       CAST(d.dau * 1000 // w.wau AS BIGINT) AS stickiness_mille
FROM wau w
JOIN dau d ON w.rday = d.day
CROSS JOIN bounds b
WHERE w.rday BETWEEN b.lo AND b.hi
ORDER BY day
"""


QUERIES = {
    "gapfill_daily_user_counts": gapfill_daily_user_counts,
    "window_analytics_suite": window_analytics_suite,
    "histogram_part_prices": histogram_part_prices,
    "locf_forward_fill": locf_forward_fill,
    "rolling_active_users": rolling_active_users,
}

ORACLES = {
    "gapfill_daily_user_counts": GAPFILL_SQL,
    "window_analytics_suite": WINDOW_SUITE_SQL,
    "histogram_part_prices": HISTOGRAM_SQL,
    "locf_forward_fill": LOCF_SQL,
    "rolling_active_users": ROLLING_ACTIVE_SQL,
}


# --------------------------------------------------------------------------
# market-basket association rules (brand level)
# --------------------------------------------------------------------------

MB_MIN_SUPP = 200  # minimum co-occurrence count for a rule


def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets at the brand level:
    for every directed brand pair A→B with joint support ≥ MB_MIN_SUPP,
    emit support, confidence = supp(AB)/supp(A) and
    lift = supp(AB)·N / (supp(A)·supp(B)) — the co-purchase signal a
    recommender or assortment analysis starts from.

    Exactness: confidence and lift live on the integer ppm/micro grids
    (one truncating integer division each; numerators stay < 2^63 at
    any realistic scale since supports are ≤ N and the grid multiplier
    is 1e6). The basket count N is a 1-row aggregate cross-joined in —
    the benign scalar-broadcast pattern, never a data-sized nested
    loop.

    Scale: baskets = one distinct over the fact join (shuffle on
    orderkey); the pair self-join fans out C(k,2) per basket — bounded
    by basket WIDTH (items per order), not corpus size — and
    aggregates straight to the item-pair grain. Item supports are an
    item-grain relation (tiny, broadcast). This is the Apriori 2-item
    step; deeper itemsets iterate the same join shape on the
    surviving frequent pairs."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), "l_partkey"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("ok", F.col("p_brand").alias("item"))
        .distinct()
    )
    n_baskets = baskets.agg(
        F.countDistinct("ok").cast("long").alias("n_baskets")
    )
    supp_item = baskets.groupBy("item").agg(
        F.count("*").cast("long").alias("s_item")
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    joint = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.item") != F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("antecedent"),
            F.col("b.item").alias("consequent"),
        )
        .agg(F.count("*").cast("long").alias("supp_ab"))
        .filter(F.col("supp_ab") >= MB_MIN_SUPP)
    )
    sa = supp_item.select(
        F.col("item").alias("antecedent"), F.col("s_item").alias("s_a")
    )
    sb = supp_item.select(
        F.col("item").alias("consequent"), F.col("s_item").alias("s_b")
    )
    return (
        joint.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sb), "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "supp_ab",
            F.expr("CAST(supp_ab * 1000000 DIV s_a AS BIGINT)").alias(
                "confidence_ppm"
            ),
            F.expr(
                "CAST(supp_ab * n_baskets * 1000000 DIV (s_a * s_b) AS BIGINT)"
            ).alias("lift_micro"),
        )
        .orderBy("antecedent", "consequent")
    )


MARKET_BASKET_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), n AS (
  SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets FROM baskets
), supp AS (
  SELECT item, CAST(count(*) AS BIGINT) AS s_item FROM baskets GROUP BY 1
), joint AS (
  SELECT a.item AS antecedent, b.item AS consequent,
         CAST(count(*) AS BIGINT) AS supp_ab
  FROM baskets a JOIN baskets b
    ON a.ok = b.ok AND a.item <> b.item
  GROUP BY 1, 2
  HAVING count(*) >= {MB_MIN_SUPP}
)
SELECT j.antecedent, j.consequent, j.supp_ab,
       CAST(j.supp_ab * 1000000 // sa.s_item AS BIGINT) AS confidence_ppm,
       CAST(j.supp_ab * n.n_baskets * 1000000
            // (sa.s_item * sb.s_item) AS BIGINT) AS lift_micro
FROM joint j
JOIN supp sa ON j.antecedent = sa.item
JOIN supp sb ON j.consequent = sb.item
CROSS JOIN n
ORDER BY antecedent, consequent
"""

QUERIES["market_basket_rules"] = market_basket_rules
ORACLES["market_basket_rules"] = MARKET_BASKET_SQL
