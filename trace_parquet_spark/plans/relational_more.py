"""Third relational batch: unpivot/melt, collection aggregates,
latest-per-key dedup, range-predicate joins, and two more TPC-H
shapes (Q7 volume shipping, Q10 returned items).

Conventions as in plans/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import _REVENUE, exact_avg, exact_avg_sql, grid_sum, grid_sum_sql


def unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of per-segment aggregates (the inverse of pivot)."""
    wide = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            exact_avg(F.col("c_acctbal"), 2).alias("avg_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )
    return wide.unpivot(
        "c_mktsegment", ["min_bal", "avg_bal", "max_bal"], "stat", "value"
    ).orderBy("c_mktsegment", "stat")


UNPIVOT_SQL = f"""
WITH wide AS (
  SELECT c_mktsegment,
         round(min(c_acctbal), 2) AS min_bal,
         {exact_avg_sql("c_acctbal", 2)} AS avg_bal,
         round(max(c_acctbal), 2) AS max_bal
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, stat, value
FROM wide
UNPIVOT (value FOR stat IN (min_bal, avg_bal, max_bal))
ORDER BY c_mktsegment, stat
"""


def collect_aggregates_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set as deterministic sorted arrays.

    Array-typed output — exercised in pytest (tests compare element-wise);
    the driver-facing ``collect_aggregates`` serializes these to strings
    because the harness canonicalizer sorts/hashes pandas frames and
    array cells are unhashable.
    """
    return (
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.sort_array(F.collect_list("n_name")).alias("nations"),
            F.sort_array(F.collect_set("n_nationkey")).alias("nation_keys"),
            F.count("*").alias("n"),
        )
        .orderBy("n_regionkey")
    )


def collect_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set, serialized to '|'-joined strings so the
    result is flat-hashable cross-engine (arrays sorted before joining for
    determinism)."""
    return (
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias(
                "nations"
            ),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_set("n_nationkey")),
                    lambda x: x.cast("string"),
                ),
                "|",
            ).alias("nation_keys"),
            F.count("*").alias("n"),
        )
        .orderBy("n_regionkey")
    )


COLLECT_AGG_SQL = """
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), '|')                  AS nations,
       array_to_string(list_sort(list(DISTINCT n_nationkey)), '|')    AS nation_keys,
       count(*)                                                       AS n
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""


def setops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) set-operation semantics — intersectAll/exceptAll
    keep duplicate multiplicity, unlike the distinct forms in
    setops_nation_keys. Exercised on order-priority multisets of two
    customer cohorts."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_custkey") % 2 == 0).select("o_orderpriority")
    b = orders.filter(F.col("o_custkey") % 3 == 0).select("o_orderpriority")
    inter = a.intersectAll(b).groupBy("o_orderpriority").agg(
        F.count("*").alias("n")
    ).select(F.lit("intersect_all").alias("op"), "o_orderpriority", "n")
    exc = a.exceptAll(b).groupBy("o_orderpriority").agg(
        F.count("*").alias("n")
    ).select(F.lit("except_all").alias("op"), "o_orderpriority", "n")
    return inter.unionByName(exc).orderBy("op", "o_orderpriority")


SETOPS_MULTISET_SQL = """
WITH a AS (SELECT o_orderpriority FROM orders WHERE o_custkey % 2 = 0),
     b AS (SELECT o_orderpriority FROM orders WHERE o_custkey % 3 = 0)
SELECT 'intersect_all' AS op, o_orderpriority, count(*) AS n
FROM (SELECT o_orderpriority FROM a INTERSECT ALL SELECT o_orderpriority FROM b)
GROUP BY o_orderpriority
UNION ALL
SELECT 'except_all' AS op, o_orderpriority, count(*) AS n
FROM (SELECT o_orderpriority FROM a EXCEPT ALL SELECT o_orderpriority FROM b)
GROUP BY o_orderpriority
ORDER BY op, o_orderpriority
"""


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup: one row per key by recency (the windowed,
    deterministic form of dropDuplicates)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id")
    )


LATEST_EVENT_SQL = """
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
FROM (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


def range_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range-predicate join: lineitems shipped within 30 days
    of their order's date. The equi key carries the join (hash/SMJ);
    the range predicate evaluates post-match — no quadratic blowup."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate").between(
                F.col("o_orderdate"),
                F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            )
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_fast_shipments"),
            exact_avg(F.col("l_extendedprice"), 2).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )


RANGE_JOIN_SQL = f"""
SELECT o_orderpriority,
       count(*) AS n_fast_shipments,
       {exact_avg_sql("l_extendedprice", 2)} AS avg_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between nation pairs."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("ship_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(
            # price and discount have ≤2 decimals each, so the product
            # sits exactly on a 1e-4 grid: quantize per TERM to integer
            # ten-thousandths (floor(x+0.5) is engine-identical; no
            # accumulated-noise boundary cases), sum exactly as longs,
            # divide once. round(sum(double)) here would hit the
            # half-up-vs-half-even .005 boundary systematically.
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 10000
                        + F.lit(0.5)
                    ).cast("long")
                )
                / F.lit(10000.0)
            ).alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


Q7_SQL = """
SELECT s_nation.n_name AS supp_nation,
       c_nation.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
         / 10000.0 AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation s_nation ON s_nationkey = s_nation.n_nationkey
JOIN nation c_nation ON c_nationkey = c_nation.n_nationkey
WHERE s_nation.n_name <> c_nation.n_name
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, ship_year
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            grid_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       {grid_sum_sql(_REVENUE, 4)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


QUERIES = {
    "unpivot_balances": unpivot_balances,
    "collect_aggregates": collect_aggregates,
    "latest_event_per_user": latest_event_per_user,
    "range_join_shipments": range_join_shipments,
    "q7_nation_volume": q7_nation_volume,
    "q10_returned_items": q10_returned_items,
    "setops_multiset": setops_multiset,
}

ORACLES = {
    "unpivot_balances": UNPIVOT_SQL,
    "collect_aggregates": COLLECT_AGG_SQL,
    "latest_event_per_user": LATEST_EVENT_SQL,
    "range_join_shipments": RANGE_JOIN_SQL,
    "q7_nation_volume": Q7_SQL,
    "q10_returned_items": Q10_SQL,
    "setops_multiset": SETOPS_MULTISET_SQL,
}


def mode_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent quantity per (returnflag, linestatus) — the mode,
    with count ties broken toward the SMALLEST value so the answer is
    unique and engine-independent. Completes the location-statistics
    family (mean: q1, median/MAD: mad_by_group, mode: here).

    Scale: one partial-agg shuffle to (group, value) counts — the
    value grid is 50-ary so the counted relation is tiny — then a
    per-group argmax window over that grid, never over rows."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = (
        li.select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .groupBy("l_returnflag", "l_linestatus", "qty")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy(
        F.desc("c"), F.asc("qty")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("qty").alias("mode_qty"),
            F.col("c").alias("mode_count"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


MODE_SQL = """
WITH counts AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus, qty
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY l_returnflag, l_linestatus
                               ORDER BY c DESC, qty) AS rn
  FROM counts
)
SELECT l_returnflag, l_linestatus, qty AS mode_qty, c AS mode_count
FROM ranked WHERE rn = 1
ORDER BY l_returnflag, l_linestatus
"""

QUERIES["mode_by_group"] = mode_by_group
ORACLES["mode_by_group"] = MODE_SQL


TOPK_TIES_K = 3


def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K order totals per priority WITH TIES — the rank() twin of
    topk_per_group's row_number(): every order tying the K-th total
    survives, so the result is value-deterministic without needing a
    tie-break column (ANSI FETCH FIRST K ROWS WITH TIES semantics).

    Scale: one priority-partitioned rank window over the cents grid;
    output is K-ish rows per group (ties bounded by value collisions,
    surfaced in the is_tie_overflow flag)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("cents"))
    staged = orders.select(
        "o_orderpriority", "o_orderkey", cents.alias("cents")
    ).withColumn("rk", F.rank().over(w))
    return (
        staged.where(F.col("rk") <= TOPK_TIES_K)
        .select(
            "o_orderpriority",
            "o_orderkey",
            (F.col("cents").cast("double") / F.lit(100.0)).alias("total"),
            F.col("rk").cast("long").alias("rk"),
            (F.col("rk") == TOPK_TIES_K).alias("is_tie_overflow"),
        )
        .orderBy("o_orderpriority", F.desc("total"), "o_orderkey")
    )


TOPK_TIES_SQL = f"""
WITH staged AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         rank() OVER (PARTITION BY o_orderpriority
                      ORDER BY CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT) DESC) AS rk
  FROM orders
)
SELECT o_orderpriority, o_orderkey,
       CAST(cents AS DOUBLE) / 100.0 AS total,
       CAST(rk AS BIGINT) AS rk,
       rk = {TOPK_TIES_K} AS is_tie_overflow
FROM staged
WHERE rk <= {TOPK_TIES_K}
ORDER BY o_orderpriority, total DESC, o_orderkey
"""

QUERIES["topk_with_ties"] = topk_with_ties
ORACLES["topk_with_ties"] = TOPK_TIES_SQL
