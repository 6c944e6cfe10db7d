"""Table registry over the driver-generated parquet test tables.

``load_table`` is the single entry point every operator and query uses
to obtain a DataFrame; it normalizes cross-engine type wrinkles once:

- ``events.ts`` is physically parquet TIMESTAMP(NANOS), which Spark 4
  rejects outright. With ``spark.sql.legacy.parquet.nanosAsLong`` the
  column arrives as epoch-nanos int64; we truncate to micros and cast
  to TIMESTAMP_NTZ (matching DuckDB's ns→us truncating cast, so the
  oracle comparison is exact).
- All other tables are plain columnar parquet reads — filters and
  projections placed on them push down to the scan (verified via
  ``.explain``: PushedFilters / ReadSchema).

At scale the same function maps to a metastore/catalog lookup; the
API deliberately stays ``(spark, base_dir, name) -> DataFrame``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{base_dir}/{name}.parquet"
    if name == "events":
        # Runtime-settable; required before planning the scan.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: double division would round the ~1.7e18
            # epoch-nanos value (53-bit mantissa) and drift ±1µs off
            # DuckDB's truncating ns→µs cast
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        return df
    return spark.read.parquet(path)


def load_table_parallel(
    spark: SparkSession, base_dir: str, name: str, key: str
) -> DataFrame:
    """Like load_table, but hash-repartitioned on ``key`` to the
    session's shuffle parallelism. Use for CPU-heavy per-row operators
    (tokenization, hashing, UDF featurization): the local test files
    are single-partition, so without this the whole stage runs on one
    core; on a cluster the same call co-locates downstream per-key work."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return load_table(spark, base_dir, name).repartition(n, key)


def register_views(spark: SparkSession, base_dir: str) -> None:
    """Register every test table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, base_dir, name).createOrReplaceTempView(name)
