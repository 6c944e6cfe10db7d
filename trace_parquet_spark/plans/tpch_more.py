"""Fourth relational batch: six more TPC-H query shapes, covering the
classic patterns the earlier batches lack — single-pass filtered
aggregate (Q6), joined ratio aggregate (Q14), view + global-max
subquery (Q15), correlated avg-quantity subquery (Q17), HAVING over a
joined aggregate (Q18), disjunctive multi-column join predicates
(Q19), and a scalar-subquery + anti-join shape (Q22).

The testdata schema omits partsupp, l_commitdate/receiptdate,
l_shipmode/shipinstruct, c_phone — so Q2/Q4/Q9/Q12/Q16/Q20/Q21 are
not expressible and the affected predicates here are adapted to the
available columns (same plan shapes, different literals).

Conventions as in plans/relational.py: grid_sum/exact_avg keep float
aggregation deterministic cross-engine; every aggregate is aliased
identically in the Spark plan and the DuckDB oracle.

Scale notes are per-query; every join that can broadcast does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import _REVENUE, exact_avg, exact_avg_sql, grid_sum, grid_sum_sql


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the pushdown showcase.
    All three predicates reach the parquet scan; no shuffle at all
    (single global aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            grid_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


Q6_SQL = f"""
SELECT {grid_sum_sql("l_extendedprice * l_discount", 4)} AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional-aggregate ratio over a broadcast join
    (part is the small dim; lineitem never shuffles)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load_table(spark, sf_dir, "part")
    rev_grid = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev_grid).otherwise(F.lit(0)))
            / F.sum(rev_grid)
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n_lines"),
    )


Q14_SQL = f"""
SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(floor(({_REVENUE}) * 10000 + 0.5) AS BIGINT)
                        ELSE 0 END)
             / sum(CAST(floor(({_REVENUE}) * 10000 + 0.5) AS BIGINT))
         AS promo_revenue_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue view + suppliers matching the global max.
    The max is a one-row aggregate joined back (Spark plans a
    broadcast of the single-row side); no window over the whole
    revenue relation needed."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(
            F.broadcast(max_rev),
            F.col("total_revenue") == F.col("max_revenue"),
        )
        .join(
            F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey")
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {grid_sum_sql(_REVENUE, 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: lines below 20% of their part's average quantity.
    The correlated subquery decorrelates to a per-part aggregate
    joined back — expressed directly that way (the plan Catalyst
    would produce), lineitem scanned twice but shuffled only by
    the compact per-part aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * exact_avg(F.col("l_quantity"), 2)).alias("qty_limit")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            (grid_sum(F.col("l_extendedprice"), 2) / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


Q17_SQL = f"""
WITH avg_qty AS (
  SELECT l_partkey AS ap_partkey,
         0.2 * {exact_avg_sql("l_quantity", 2)} AS qty_limit
  FROM lineitem GROUP BY l_partkey
)
SELECT {grid_sum_sql("l_extendedprice", 2)} / 7.0 AS avg_yearly,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_qty ON l_partkey = ap_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < qty_limit
"""


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold
    (HAVING over the lineitem aggregate), joined to customers.
    The HAVING filter collapses lineitem before any wide join, but the
    surviving key set (and customer) scale linearly with SF — no
    forced broadcast; size/AQE decides (the classic Q18 plan shuffles
    here at scale, and locally Spark still auto-broadcasts under the
    threshold)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(grid_sum(F.col("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 220)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       o_orderdate AS orderdate, o_totalprice AS totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, {grid_sum_sql("l_quantity", 2)} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {grid_sum_sql("l_quantity", 2)} > 220
) big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, o_orderkey
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of conjunctive brand/size/quantity
    bands. The join key is the equi p_partkey (hash-joinable);
    the OR-of-ANDs evaluates post-join — Catalyst keeps the equi
    part in the join condition and the disjunction as a filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


Q19_SQL = f"""
SELECT {grid_sum_sql(_REVENUE, 4)} AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 21)
   OR (p_brand = 'Brand#9'  AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers dormant since
    2000 (every synthetic customer has SOME order, so the anti join
    runs against the recent-orders slice), grouped by nation. Scalar
    subquery (global avg broadcast as a one-row cross join) + anti
    join; the date filter pushes into the orders scan before the
    anti join's shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        exact_avg(F.col("c_acctbal"), 2).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_customers"),
            grid_sum(F.col("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("nation_name")
    )


Q22_SQL = f"""
SELECT n_name AS nation_name,
       count(*) AS n_customers,
       {grid_sum_sql("c_acctbal", 2)} AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT {exact_avg_sql("c_acctbal", 2)}
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
ORDER BY nation_name
"""


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customer": q18_large_volume_customer,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
}

ORACLES = {
    "q6_forecast_revenue": Q6_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q18_large_volume_customer": Q18_SQL,
    "q19_discounted_revenue": Q19_SQL,
    "q22_global_sales_opportunity": Q22_SQL,
}
