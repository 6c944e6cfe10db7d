"""Right-to-be-forgotten cascade audit: given a cohort of customers to
erase, report exactly how many rows each downstream table loses when
the deletion cascades through the foreign-key chain
customer → orders → lineitem.

The audit is the dry-run half of a GDPR erasure job — at 100 TB you
run THIS first (cheap: semi-join counts, no rewrites), compare against
retention policy, then execute the actual anti-join rewrites
per-partition. The cohort here is the deterministic slice
``c_custkey % FORGET_MOD == 0`` standing in for a request list.

Scale: each count is one semi-join keyed on the child's FK — the
cohort/orders key sets broadcast when small, hash-join otherwise; no
table is scanned more than once, and nothing is rewritten. The UNION
of three one-row aggregates is driver-trivial.

Reference: no counterpart (the reference only ever reads,
service/DataExportService.java:31-43); extends the warehouse-
maintenance family (MERGE, SCD2, CDC, compaction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

FORGET_MOD = 97


def cascade_forget_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table deleted-row counts for the erasure cohort."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % FORGET_MOD == 0
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").join(
        F.broadcast(cust),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").join(
        orders,
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count("*").cast("long").alias("n_rows_deleted"),
        )

    return (
        one("customer", cust)
        .unionAll(one("orders", orders))
        .unionAll(one("lineitem", li))
        .orderBy("table_name")
    )


CASCADE_FORGET_SQL = f"""
WITH cohort AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {FORGET_MOD} = 0
), doomed_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM cohort)
), doomed_items AS (
  SELECT l_orderkey FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_orders)
)
SELECT 'customer' AS table_name,
       CAST((SELECT count(*) FROM cohort) AS BIGINT) AS n_rows_deleted
UNION ALL
SELECT 'lineitem', CAST((SELECT count(*) FROM doomed_items) AS BIGINT)
UNION ALL
SELECT 'orders', CAST((SELECT count(*) FROM doomed_orders) AS BIGINT)
ORDER BY table_name
"""


QUERIES = {"cascade_forget_audit": cascade_forget_audit}
ORACLES = {"cascade_forget_audit": CASCADE_FORGET_SQL}
