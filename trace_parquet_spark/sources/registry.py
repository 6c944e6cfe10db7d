"""Table registry over the driver-generated parquet test tables.

``load_table`` is the single entry point every operator and query uses
to obtain a DataFrame; it normalizes cross-engine type wrinkles once:

- ``events.ts`` is physically parquet TIMESTAMP(NANOS), which Spark 4
  rejects outright. With ``spark.sql.legacy.parquet.nanosAsLong`` the
  column arrives as epoch-nanos int64; we truncate to micros and cast
  to TIMESTAMP_NTZ (matching DuckDB's ns→us truncating cast, so the
  oracle comparison is exact).
- Because the rederivation (``timestamp_micros(ts div 1000)``) hides
  the scan column behind an expression, a time-range predicate placed
  on the derived ``ts`` can never reach the parquet reader. The
  ``ts_between=(start, end)`` option closes that hole: the bounds are
  converted to raw epoch-nanos with exact integer arithmetic and
  filtered on the bigint column BEFORE the cast, so the range lands in
  ``PushedFilters`` (GreaterThanOrEqual/LessThanOrEqual on ``ts``) and
  prunes row groups via parquet min/max stats. At 100 TB, time is THE
  pruning dimension of an events table — this is the difference
  between scanning a window and scanning the table.
- All other tables are plain columnar parquet reads — filters and
  projections placed on them push down to the scan (verified via
  ``.explain``: PushedFilters / ReadSchema).

At scale the same function maps to a metastore/catalog lookup; the
API deliberately stays ``(spark, base_dir, name) -> DataFrame``.
"""

from __future__ import annotations

import calendar
from datetime import datetime

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


def _epoch_micros_utc(t: datetime | str) -> int:
    """Naive-UTC wall time → epoch microseconds, pure integer arithmetic
    (``datetime.timestamp()`` returns a float; fine below 2^53 µs but
    we don't want to have to argue about it)."""
    dt = datetime.fromisoformat(t) if isinstance(t, str) else t
    return calendar.timegm(dt.timetuple()) * 1_000_000 + dt.microsecond


def ts_bounds_nanos(start: datetime | str, end: datetime | str) -> tuple[int, int]:
    """Raw epoch-nanos bounds equivalent to an inclusive BETWEEN on the
    µs-truncated timestamp. A nanos value n satisfies
    ``start ≤ floor(n/1000)µs ≤ end`` iff
    ``start_µs*1000 ≤ n ≤ end_µs*1000 + 999`` — exact, no edge rows
    gained or lost relative to filtering the derived column."""
    return _epoch_micros_utc(start) * 1000, _epoch_micros_utc(end) * 1000 + 999


def load_table(
    spark: SparkSession,
    base_dir: str,
    name: str,
    ts_between: tuple[datetime | str, datetime | str] | None = None,
) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if ts_between is not None and name != "events":
        raise ValueError("ts_between is only meaningful for the events table")
    path = f"{base_dir}/{name}.parquet"
    if name == "events":
        # Runtime-settable; required before planning the scan.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            if ts_between is not None:
                # Filter the raw bigint BEFORE the rederivation so the
                # range reaches PushedFilters (row-group pruning); the
                # reference pushes this exact predicate to its store
                # (ParameterDataRepository.java:66-67).
                lo, hi = ts_bounds_nanos(*ts_between)
                df = df.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
            # integer division: double division would round the ~1.7e18
            # epoch-nanos value (53-bit mantissa) and drift ±1µs off
            # DuckDB's truncating ns→µs cast
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        elif ts_between is not None:
            # ts already timestamp-typed: a plain between pushes as-is.
            start, end = ts_between
            df = df.filter(
                F.col("ts").between(
                    F.lit(str(start)).cast("timestamp_ntz"),
                    F.lit(str(end)).cast("timestamp_ntz"),
                )
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
