"""Explicit GROUPING SETS (SURVEY §2.4 — rollup/cube's general form).

Arbitrary grouping-set lists are the primitive rollup and cube
desugar into; Spark 4 exposes them first-class on the DataFrame API
(``df.groupingSets``), which plans a single Expand + one aggregation
pass — the same physical shape as rollup/cube, no per-set re-scan.
GROUPING() is folded into 'ALL' labels exactly like the rollup/cube
queries in plans/relational.py so output is plain strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import grid_sum, grid_sum_sql


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets ((region, segment), (region), ()) over customers —
    deliberately NOT a rollup (the (segment) set is absent), so only
    the explicit API can express it."""
    df = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return (
        df.groupingSets(
            [["r_name", "c_mktsegment"], ["r_name"], []],
            "r_name",
            "c_mktsegment",
        )
        .agg(
            F.when(F.grouping("r_name") == 1, F.lit("ALL"))
            .otherwise(F.col("r_name"))
            .alias("region_name"),
            F.when(F.grouping("c_mktsegment") == 1, F.lit("ALL"))
            .otherwise(F.col("c_mktsegment"))
            .alias("segment"),
            F.count("*").alias("n_customers"),
            grid_sum(F.col("c_acctbal"), 2).alias("total_acctbal"),
        )
        .select("region_name", "segment", "n_customers", "total_acctbal")
        .orderBy("region_name", "segment")
    )


GROUPING_SETS_SQL = f"""
SELECT CASE WHEN GROUPING(r_name) = 1 THEN 'ALL' ELSE r_name END AS region_name,
       CASE WHEN GROUPING(c_mktsegment) = 1 THEN 'ALL' ELSE c_mktsegment END AS segment,
       count(*)                 AS n_customers,
       {grid_sum_sql("c_acctbal", 2)} AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name), ())
ORDER BY region_name, segment
"""


QUERIES = {"grouping_sets_revenue": grouping_sets_revenue}
ORACLES = {"grouping_sets_revenue": GROUPING_SETS_SQL}
