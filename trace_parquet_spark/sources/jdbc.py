"""JDBC source — the reference's actual input (SURVEY §2.1 S1).

The reference reads ``TD_FD_TRACE_PARAM`` from Oracle (R2DBC) with the
predicate fully pushed into the database
(reference: repository/ParameterDataRepository.java:53-78). Spark's
JDBC datasource gives the same pushdown declaratively; for scale we
expose partitioned reads (predicate-ranged parallel scans) instead of
the reference's single reactive cursor.

No JDBC driver jar ships in this test image, so everything here is
plan-construction only; tests exercise it against the parquet fixture
through the same ``scan_trace_param`` signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    **options,
) -> DataFrame:
    """Parallel JDBC scan. With partition bounds Spark issues
    ``numPartitions`` range-disjoint queries — the scale path for a
    100 TB-backing table; without, a single-cursor read (reference
    behavior)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
        .option("pushDownPredicate", "true")
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 32))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def project_trace_param(df: DataFrame) -> DataFrame:
    """The reference's row-mapper as a projection (SURVEY §2.1 S2):
    4 aliased columns + Number→Long widening
    (reference: repository/ParameterDataRepository.java:29-39)."""
    return df.select(
        F.col("PARAM_INDEX").cast("long").alias("paramIndex"),
        F.col("START_TIME").cast("timestamp").alias("startTime"),
        F.col("END_TIME").cast("timestamp").alias("endTime"),
        F.col("TRACE_DATA").cast("binary").alias("traceData"),
    )
