"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Writing both tables bucketed by the join key (same bucket
count) lets Spark's SortMergeJoin read bucket i of each side into the
same task — zero Exchange in the plan. This module wraps the
write-side setup and a join helper; the test asserts the Exchange-free
plan, which is the contract that matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed managed table (metastore-backed; in local
    tests the embedded catalog + spark-warehouse dir)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
