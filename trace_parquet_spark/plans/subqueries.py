"""Correlated-subquery surface through spark.sql: scalar subqueries in
the SELECT list (Catalyst decorrelates to outer joins over aggregates)
and null-aware NOT IN (compiles to a null-aware anti join) — the two
subquery shapes that trip naive engines.

The reference's one query has no subqueries (single-table SELECT,
repository/ParameterDataRepository.java:53-78); SURVEY §2.3 lists the join
forms these decorrelate into. Both run the IDENTICAL SQL text on
DuckDB — cross-engine SQL-semantics parity, not just value parity.

Scale: the scalar subqueries decorrelate into per-key aggregates
joined back (one shuffle each, no per-row re-execution); NOT IN
broadcasts the (small, filtered) subquery side. Decorrelation is
asserted in tests/test_plans.py (no CartesianProduct, LeftAnti
present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

SCALAR_SUBQUERY_SQL = """
SELECT c_custkey,
       c_name,
       (SELECT CAST(count(*) AS BIGINT) FROM orders o
        WHERE o.o_custkey = c.c_custkey)        AS n_orders,
       (SELECT max(o_totalprice) FROM orders o
        WHERE o.o_custkey = c.c_custkey)        AS max_order_price
FROM customer c
WHERE c_custkey < 300
ORDER BY c_custkey
"""

NOT_IN_SQL = """
SELECT p_partkey, p_name
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                        WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
ORDER BY p_partkey
"""


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def scalar_subquery_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries per customer: order count (0 for
    customers with no orders — scalar COUNT over empty is 0, not NULL)
    and max order price (NULL when empty)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(SCALAR_SUBQUERY_SQL)


def not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a subquery — null-aware anti join semantics (one
    NULL in the subquery result would empty the output; the planner
    must preserve that, which plain LeftAnti does not)."""
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(NOT_IN_SQL)


LATERAL_SQL = """
SELECT c.c_custkey, t.top_orderkey, t.top_cents
FROM customer c,
LATERAL (
  SELECT o_orderkey AS top_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS top_cents
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY top_cents DESC, o_orderkey
  LIMIT 1
) t
WHERE c.c_custkey < 500
ORDER BY c.c_custkey
"""


def lateral_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table (SQL:1999, Spark 4): the
    biggest order per customer via a per-row ORDER BY ... LIMIT 1
    subquery. Catalyst decorrelates the lateral into a ranked window
    join rather than re-running the inner query per outer row —
    the same top-1-per-group physical shape as topk_per_group, reached
    from the SQL surface. Inner-lateral semantics drop order-less
    customers on both engines."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(LATERAL_SQL)


QUERIES = {
    "scalar_subquery_order_stats": scalar_subquery_order_stats,
    "not_in_null_aware": not_in_null_aware,
    "lateral_top_order_per_customer": lateral_top_order_per_customer,
}

ORACLES = {
    "scalar_subquery_order_stats": SCALAR_SUBQUERY_SQL,
    "not_in_null_aware": NOT_IN_SQL,
    "lateral_top_order_per_customer": LATERAL_SQL,
}


def multi_exists_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q35/Q69 shape: segment customers by MULTIPLE correlated
    existence predicates in one query — EXISTS(orders), EXISTS(urgent
    order), NOT EXISTS(high-value order) — and aggregate the segments
    per nation. Each predicate must decorrelate to a semi/anti join
    (never a per-row subquery); the segment flags become conditional
    aggregates.

    Spark side: explicit left_semi/left_anti joins produce boolean
    flag columns via a distinct-key join + null check — the plan the
    optimizer should reach from the EXISTS formulation, stated
    directly so the shape is pinned.

    Scale: three key-grained distinct relations (customer-key sets),
    each joined once; the wide fact table is scanned once per
    predicate and reduced to keys before any join."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders")
    has_order = o.select("o_custkey").distinct().withColumn(
        "has_o", F.lit(1)
    )
    has_urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
        .withColumn("has_u", F.lit(1))
    )
    has_big = (
        o.filter(F.col("o_totalprice") > 150000)
        .select("o_custkey")
        .distinct()
        .withColumn("has_b", F.lit(1))
    )
    seg = (
        c.join(has_order, c.c_custkey == has_order.o_custkey, "left")
        .drop("o_custkey")
        .join(has_urgent, c.c_custkey == has_urgent.o_custkey, "left")
        .drop("o_custkey")
        .join(has_big, c.c_custkey == has_big.o_custkey, "left")
        .drop("o_custkey")
        .filter(
            F.col("has_o").isNotNull()
            & F.col("has_u").isNotNull()
            & F.col("has_b").isNull()
        )
    )
    return (
        seg.join(F.broadcast(n), seg.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .orderBy("n_name")
    )


MULTI_EXISTS_SQL = """
SELECT n.n_name, count(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 150000)
GROUP BY n.n_name
ORDER BY n.n_name
"""

QUERIES["multi_exists_segmentation"] = multi_exists_segmentation
ORACLES["multi_exists_segmentation"] = MULTI_EXISTS_SQL
