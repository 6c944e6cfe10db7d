"""TPC-DS-style query shapes the TPC-H suite doesn't exercise, adapted
to the TPC-H-ish tables: a rank() window OVER a ROLLUP result (the
TPC-DS Q67 pattern — rank every aggregation level of a hierarchy
inside its parent partition) and a multi-channel UNION ALL conformance
rollup (the Q71 "union the channels, then aggregate the union"
pattern, here over event types standing in for channels).

Reference: no counterpart (single-query engine); these extend the
§2.4/§2.5 agg+window surface toward warehouse-benchmark shapes.

Cross-engine care: revenues come from grid_sum (exact integer sums —
see plans/relational.py), so window ORDER BY on them compares exact
values; ties are broken by the dimension string with a COALESCE
because Spark sorts NULLS FIRST ascending while DuckDB sorts NULLS
LAST (rollup subtotal rows carry NULL dimensions).

Scale: ROLLUP is one shuffle producing every level via partial
aggregation; the window then partitions the tiny aggregate, not the
fact table. The union rollup scans events once per branch — at real
scale the branches would be separate sources, which is the point of
the shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import grid_sum, grid_sum_sql

TOPK = 5

# The testdata part table carries p_brand ('Brand#1'..'Brand#25') but no
# p_mfgr; derive the 5-way parent level from the brand number the way
# TPC-H's generator nests brands under manufacturers.
_MFGR_SPARK = (
    "concat('Manufacturer#',"
    " cast((cast(substring(p_brand, 7) as int) - 1) div 5 + 1 as string))"
)
_MFGR_DUCK = (
    "'Manufacturer#' ||"
    " CAST((CAST(substring(p_brand, 7) AS INTEGER) - 1) // 5 + 1 AS VARCHAR)"
)


def rollup_rank_mfgr_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67 shape: revenue by ROLLUP(p_mfgr, p_brand), then the
    top-5 rows per manufacturer partition ranked by revenue — subtotal
    rows (p_brand NULL) rank inside their manufacturer, the grand
    total in the all-NULL partition."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.expr(_MFGR_SPARK).alias("p_mfgr"), "p_brand"
    )
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .rollup("p_mfgr", "p_brand")
        .agg(
            grid_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("p_mfgr").orderBy(
        F.desc("revenue"), F.coalesce("p_brand", F.lit(""))
    )
    return (
        agg.withColumn("rk", F.rank().over(w).cast("long"))
        .filter(F.col("rk") <= TOPK)
        .select("p_mfgr", "p_brand", "revenue", "rk")
        .orderBy(
            F.coalesce("p_mfgr", F.lit("")), "rk", F.coalesce("p_brand", F.lit(""))
        )
    )


ROLLUP_RANK_SQL = f"""
WITH pm AS (
  SELECT p_partkey, {_MFGR_DUCK} AS p_mfgr, p_brand FROM part
), agg AS (
  SELECT p.p_mfgr, p.p_brand,
         {grid_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
  FROM lineitem l JOIN pm p ON l.l_partkey = p.p_partkey
  GROUP BY ROLLUP (p.p_mfgr, p.p_brand)
), ranked AS (
  SELECT p_mfgr, p_brand, revenue,
         CAST(rank() OVER (
           PARTITION BY p_mfgr
           ORDER BY revenue DESC, COALESCE(p_brand, '')
         ) AS BIGINT) AS rk
  FROM agg
)
SELECT p_mfgr, p_brand, revenue, rk
FROM ranked
WHERE rk <= {TOPK}
ORDER BY COALESCE(p_mfgr, ''), rk, COALESCE(p_brand, '')
"""


def channel_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q71 shape: normalize heterogeneous "channels" (here,
    purchase vs signup vs other event types) into one schema with
    UNION ALL, then aggregate the union by hour across channels."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "user_id")

    def chan(name: str, pred):
        return ev.filter(pred).select(
            F.lit(name).alias("channel"), "ts", "user_id"
        )

    unioned = (
        chan("purchase", F.col("event_type") == "purchase")
        .unionAll(chan("signup", F.col("event_type") == "signup"))
        .unionAll(
            chan("other", ~F.col("event_type").isin("purchase", "signup"))
        )
    )
    return (
        unioned.groupBy(
            "channel", F.hour("ts").cast("long").alias("hour_of_day")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("channel", "hour_of_day")
    )


CHANNEL_UNION_SQL = """
WITH ev AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, user_id FROM events
), unioned AS (
  SELECT 'purchase' AS channel, ts, user_id FROM ev WHERE event_type = 'purchase'
  UNION ALL
  SELECT 'signup'   AS channel, ts, user_id FROM ev WHERE event_type = 'signup'
  UNION ALL
  SELECT 'other'    AS channel, ts, user_id FROM ev
  WHERE event_type NOT IN ('purchase', 'signup')
)
SELECT channel,
       CAST(hour(ts) AS BIGINT)              AS hour_of_day,
       count(*)                              AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM unioned
GROUP BY channel, hour(ts)
ORDER BY channel, hour_of_day
"""


# quantity bands x discount predicate, all answered in ONE fact scan
BANDS = [(1, 10), (11, 20), (21, 30), (31, 40), (41, 50)]


def multi_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 shape: several banded counts answered by a single
    scan with conditional aggregation — the alternative (one subquery
    per band, as Q88 is written) scans the fact table B times; the
    conditional-sum form is the plan you want at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount"
    )
    aggs = [
        F.sum(
            F.when(
                (F.col("l_quantity") >= lo)
                & (F.col("l_quantity") <= hi)
                & (F.col("l_discount") >= 0.05),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias(f"band_{lo}_{hi}")
        for lo, hi in BANDS
    ]
    return li.agg(*aggs)


_BAND_COLS_SQL = ",\n       ".join(
    f"CAST(sum(CASE WHEN l_quantity >= {lo} AND l_quantity <= {hi}"
    f" AND l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS band_{lo}_{hi}"
    for lo, hi in BANDS
)

MULTI_BAND_SQL = f"""
SELECT {_BAND_COLS_SQL}
FROM lineitem
"""


def cumulative_channel_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51 shape: two channels' cumulative series compared
    month-by-month inside each partition. Here: urgent-priority vs
    other order revenue per (nation, month), running totals via
    nation-partitioned windows over the already-aggregated relation
    (the window never touches the fact table), and a flag for months
    where the urgent channel leads. Money rides the exact cent grid
    so the cumulative comparison is integer-exact."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("long")
            .alias("month"),
            F.when(urgent, cents).otherwise(F.lit(0)).alias("u_cents"),
            F.when(~urgent, cents).otherwise(F.lit(0)).alias("o_cents"),
        )
        .groupBy("n_name", "month")
        .agg(
            F.sum("u_cents").alias("u_rev"),
            F.sum("o_cents").alias("o_rev"),
        )
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        g.withColumn("cum_urgent_cents", F.sum("u_rev").over(w).cast("long"))
        .withColumn("cum_other_cents", F.sum("o_rev").over(w).cast("long"))
        .select(
            "n_name",
            "month",
            "cum_urgent_cents",
            "cum_other_cents",
            (F.col("cum_urgent_cents") > F.col("cum_other_cents"))
            .cast("long")
            .alias("urgent_leads"),
        )
        .orderBy("n_name", "month")
    )


CUM_CHANNEL_SQL = """
WITH g AS (
  SELECT n.n_name,
         CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT)
           AS month,
         CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS u_rev,
         CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 0
                  ELSE CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                  END) AS BIGINT) AS o_rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
cum AS (
  SELECT n_name, month,
         CAST(sum(u_rev) OVER w AS BIGINT) AS cum_urgent_cents,
         CAST(sum(o_rev) OVER w AS BIGINT) AS cum_other_cents
  FROM g
  WINDOW w AS (PARTITION BY n_name ORDER BY month
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT n_name, month, cum_urgent_cents, cum_other_cents,
       CAST(cum_urgent_cents > cum_other_cents AS BIGINT) AS urgent_leads
FROM cum
ORDER BY n_name, month
"""


def group_having_frequent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34/Q73 shape: aggregate the fact table per customer,
    keep only groups whose count lands in a band (HAVING BETWEEN),
    then join the surviving keys back to the dimension for display
    attributes. The HAVING runs on the aggregate BEFORE the dimension
    join, so the join input is the filtered group list, not the fact
    table — at scale the band filter is what makes the join small."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    grp = (
        orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .filter(F.col("n_orders").between(3, 6))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    return (
        grp.join(cust, grp.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "n_orders")
        .orderBy(F.desc("n_orders"), "c_custkey")
    )


GROUP_HAVING_SQL = """
WITH grp AS (
  SELECT o_custkey, count(*) AS n_orders
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY o_custkey
  HAVING count(*) BETWEEN 3 AND 6
)
SELECT c.c_custkey, c.c_name, CAST(g.n_orders AS BIGINT) AS n_orders
FROM grp g JOIN customer c ON g.o_custkey = c.c_custkey
ORDER BY n_orders DESC, c_custkey
"""


def channel_overlap_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q97 shape: which customers bought through channel A,
    channel B, or both — a FULL OUTER join of two per-channel distinct
    key sets, reduced to three overlap counts. Here the channels are
    urgent-priority vs low-priority orders. The full outer join is the
    operator under test (the rest of the join surface covers inner/
    semi/anti/range/asof); both sides arrive pre-deduplicated, so the
    join is key-to-key, shuffled on the same key, and AQE-coalesced."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )

    def chan(pred):
        return orders.filter(pred).select("o_custkey").distinct()

    a = chan(F.col("o_orderpriority") == "1-URGENT").withColumnRenamed(
        "o_custkey", "a_key"
    )
    b = chan(F.col("o_orderpriority") == "5-LOW").withColumnRenamed(
        "o_custkey", "b_key"
    )
    joined = a.join(b, a.a_key == b.b_key, "full_outer")
    return joined.agg(
        F.count(
            F.when(F.col("a_key").isNotNull() & F.col("b_key").isNull(), 1)
        )
        .cast("long")
        .alias("only_urgent"),
        F.count(
            F.when(F.col("a_key").isNull() & F.col("b_key").isNotNull(), 1)
        )
        .cast("long")
        .alias("only_low"),
        F.count(
            F.when(F.col("a_key").isNotNull() & F.col("b_key").isNotNull(), 1)
        )
        .cast("long")
        .alias("both_channels"),
    )


CHANNEL_OVERLAP_SQL = """
WITH a AS (
  SELECT DISTINCT o_custkey AS a_key FROM orders
  WHERE o_orderpriority = '1-URGENT'
), b AS (
  SELECT DISTINCT o_custkey AS b_key FROM orders
  WHERE o_orderpriority = '5-LOW'
)
SELECT count(CASE WHEN a_key IS NOT NULL AND b_key IS NULL THEN 1 END)
         AS only_urgent,
       count(CASE WHEN a_key IS NULL AND b_key IS NOT NULL THEN 1 END)
         AS only_low,
       count(CASE WHEN a_key IS NOT NULL AND b_key IS NOT NULL THEN 1 END)
         AS both_channels
FROM a FULL OUTER JOIN b ON a.a_key = b.b_key
"""


QUERIES = {
    "rollup_rank_mfgr_brand": rollup_rank_mfgr_brand,
    "channel_union_rollup": channel_union_rollup,
    "multi_band_counts": multi_band_counts,
    "cumulative_channel_compare": cumulative_channel_compare,
    "group_having_frequent_buyers": group_having_frequent_buyers,
    "channel_overlap_full_outer": channel_overlap_full_outer,
}

ORACLES = {
    "rollup_rank_mfgr_brand": ROLLUP_RANK_SQL,
    "channel_union_rollup": CHANNEL_UNION_SQL,
    "multi_band_counts": MULTI_BAND_SQL,
    "cumulative_channel_compare": CUM_CHANNEL_SQL,
    "group_having_frequent_buyers": GROUP_HAVING_SQL,
    "channel_overlap_full_outer": CHANNEL_OVERLAP_SQL,
}


def monthly_deviation_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q47 shape: per-series moving deviation from the yearly
    mean, globally ranked. Monthly brand revenue (exact cent grid) is
    compared against that brand-year's average month; the TOPK largest
    absolute deviations are reported with their neighboring months
    (the lag/lead columns Q47 drags along so an analyst sees the
    spike's context without a second query).

    Exactness: the deviation is computed as the integer
    monthly·n − Σ_year (both exact int64) and divided ONCE by n into
    a 1e-6-rounded double — cross-engine-identical, and the rank's
    tie-break is total (dev, brand, month), so row TOPK is unique.

    Scale: one fact-table shuffle into the (brand, month) aggregate;
    every window (year stats, lag/lead) partitions the AGGREGATE
    relation (≤ brands×months rows), never the fact table; the final
    rank is orderBy().limit() → TakeOrderedAndProject, not a global
    sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("g4"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("month"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    g = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "yr", "month")
        .agg(F.sum("g4").alias("cents4"))
    )
    wyear = Window.partitionBy("p_brand", "yr")
    wser = Window.partitionBy("p_brand").orderBy("month")
    scored = (
        g.withColumn("n_months", F.count("*").over(wyear).cast("long"))
        .withColumn("year_sum", F.sum("cents4").over(wyear).cast("long"))
        .withColumn(
            "dev6",
            F.round(
                F.abs(
                    F.col("cents4") * F.col("n_months") - F.col("year_sum")
                ).cast("double")
                / F.col("n_months")
                / F.lit(10000.0),
                6,
            ),
        )
        .withColumn("prev_rev", F.round(F.lag("cents4").over(wser) / 10000.0, 4))
        .withColumn("next_rev", F.round(F.lead("cents4").over(wser) / 10000.0, 4))
    )
    return (
        scored.select(
            "p_brand",
            "month",
            F.round(F.col("cents4") / 10000.0, 4).alias("month_rev"),
            "n_months",
            "dev6",
            "prev_rev",
            "next_rev",
        )
        .orderBy(F.desc("dev6"), "p_brand", "month")
        .limit(4 * TOPK)
    )


MONTHLY_DEV_SQL = f"""
WITH g AS (
  SELECT p.p_brand,
         CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT)
           AS month,
         CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000
                             + 0.5) AS BIGINT)) AS BIGINT) AS cents4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p   ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT p_brand, month, cents4,
         CAST(count(*) OVER wy AS BIGINT) AS n_months,
         CAST(sum(cents4) OVER wy AS BIGINT) AS year_sum,
         round(lag(cents4) OVER ws / 10000.0, 4) AS prev_rev,
         round(lead(cents4) OVER ws / 10000.0, 4) AS next_rev
  FROM g
  WINDOW wy AS (PARTITION BY p_brand, yr),
         ws AS (PARTITION BY p_brand ORDER BY month)
)
SELECT p_brand, month,
       round(cents4 / 10000.0, 4) AS month_rev,
       n_months,
       round(CAST(abs(cents4 * n_months - year_sum) AS DOUBLE)
             / n_months / 10000.0, 6) AS dev6,
       prev_rev, next_rev
FROM scored
ORDER BY dev6 DESC, p_brand, month
LIMIT {4 * TOPK}
"""

QUERIES["monthly_deviation_rank"] = monthly_deviation_rank
ORACLES["monthly_deviation_rank"] = MONTHLY_DEV_SQL


def repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q38-shape multi-way INTERSECT: customers who ordered in
    each of three consecutive months (1995-01..03), with their margin
    over the pairwise overlaps via EXCEPT (the Q87 companion — in
    month 1 and 2 but NOT 3). One row per retained customer plus a
    months_active tag so the result is self-describing.

    Scale: each month's key set is one pushdown-filtered scan +
    distinct; INTERSECT/EXCEPT hash-partition on the key — the same
    exchange reused across both operators (co-partitioned by
    construction). No fact-table rescans past the first pass."""
    orders = load_table(spark, sf_dir, "orders")

    def month_keys(m: int):
        return (
            orders.where(
                (F.col("o_orderdate") >= f"1995-0{m}-01")
                & (F.col("o_orderdate") < f"1995-0{m + 1}-01")
            )
            .select("o_custkey")
            .distinct()
        )

    m1, m2, m3 = month_keys(1), month_keys(2), month_keys(3)
    all3 = m1.intersect(m2).intersect(m3).select(
        "o_custkey", F.lit("all_three").alias("months_active")
    )
    only12 = (
        m1.intersect(m2)
        .exceptAll(m3)
        .select("o_custkey", F.lit("jan_feb_not_mar").alias("months_active"))
    )
    return all3.unionAll(only12).orderBy("months_active", "o_custkey")


REPEAT_BUYERS_SQL = """
WITH m1 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-02-01'
), m2 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= '1995-02-01' AND o_orderdate < '1995-03-01'
), m3 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= '1995-03-01' AND o_orderdate < '1995-04-01'
)
SELECT o_custkey, 'all_three' AS months_active
FROM (SELECT * FROM m1 INTERSECT SELECT * FROM m2
      INTERSECT SELECT * FROM m3)
UNION ALL
SELECT o_custkey, 'jan_feb_not_mar' AS months_active
FROM (SELECT * FROM m1 INTERSECT SELECT * FROM m2
      EXCEPT SELECT * FROM m3)
ORDER BY months_active, o_custkey
"""

QUERIES["repeat_buyers_intersect"] = repeat_buyers_intersect
ORACLES["repeat_buyers_intersect"] = REPEAT_BUYERS_SQL
