"""Correlated-subquery surface through spark.sql: scalar subqueries in
the SELECT list (Catalyst decorrelates to outer joins over aggregates)
and null-aware NOT IN (compiles to a null-aware anti join) — the two
subquery shapes that trip naive engines.

The reference's one query has no subqueries (single-table SELECT,
service/DataExportService.java:31-43); SURVEY §2.3 lists the join
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


QUERIES = {
    "scalar_subquery_order_stats": scalar_subquery_order_stats,
    "not_in_null_aware": not_in_null_aware,
}

ORACLES = {
    "scalar_subquery_order_stats": SCALAR_SUBQUERY_SQL,
    "not_in_null_aware": NOT_IN_SQL,
}
