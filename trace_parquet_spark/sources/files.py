"""File-format sources & sinks beyond parquet (SURVEY §2.1 S8).

Thin, uniform wrappers so callers declare format + options and Catalyst
still sees a plain datasource scan (pushdown/pruning intact).
csv/json/orc round-trips are oracle-gated end-to-end by
sources/formats.py's multi_format_roundtrip. Avro needs the external
spark-avro jar (NOT shipped in this image's pyspark distribution —
probed: `Failed to find data source: avro`), so the wrapper accepts
the format and Spark raises its standard deploy-the-module error;
same env-blocked standing as the Kafka jar (sources/kafka.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_READERS = ("parquet", "csv", "json", "orc", "avro", "text")


def read_table(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    if fmt not in _READERS:
        raise ValueError(f"unsupported format {fmt!r}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.format(fmt).options(**options).load(path)


def write_table(
    df: DataFrame,
    fmt: str,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    writer = df.write.mode(mode).format(fmt).options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_single_parquet_file(df: DataFrame, path: str, ordered: bool = True) -> None:
    """The reference's sink shape: ONE parquet file (SURVEY §2.1 S5).

    The reference serializes the whole result into a single in-memory
    parquet file (reference: service/ParquetConversionService.java:60-96).
    ``coalesce(1)`` reproduces the single-file artifact — correct for
    API-response-sized exports. For the 100 TB variant use
    ``write_partitioned_sorted`` instead.
    """
    (df.coalesce(1) if ordered else df).write.mode("overwrite").parquet(path)


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ~target-sized files. The operational chore every long-running
    100 TB pipeline needs — streaming sinks and per-batch writers leave
    thousands of KB-sized files whose open/footer overhead dominates
    scans. File count is derived from the dataset's actual on-disk
    bytes (Hadoop FS metadata — no data read), then one coalesce-write;
    coalesce (not repartition) avoids a shuffle: compaction only merges
    read splits. Returns the number of files written."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    spark.read.parquet(in_path).coalesce(int(n_files)).write.mode(
        "overwrite"
    ).parquet(out_path)
    out_jpath = jvm.org.apache.hadoop.fs.Path(out_path)
    statuses = fs.listStatus(out_jpath)
    return sum(
        1
        for s in statuses
        if s.getPath().getName().startswith("part-")
    )


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-binary ingestion for multimodal payloads (images / audio /
    video files on disk) via Spark's built-in ``binaryFile`` source:
    one row per file with (path, modificationTime, length, content).

    This is the on-ramp from an object store full of media files into
    the ``operators.multimodal`` pipeline: select content as payload
    and hand it to the mapInPandas featurizer. The source is listing-
    parallel (driver lists, executors read), supports pathGlobFilter
    pushdown, and never decodes — decode happens in the Arrow-batched
    UDF where it belongs.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_parquet_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: union the schemas of all footers instead
    of trusting the first file (``mergeSchema``). Columns absent in a
    file surface as NULLs — the contract long-lived 100 TB datasets
    need when new pipeline versions add columns. (Costs one footer read
    per file at planning; leave it off — Spark's default — for
    known-stable datasets.)
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def write_partitioned_sorted(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    num_partitions: int | None = None,
) -> None:
    """Scale variant of the ordered sink: range-partition by the sort
    key, sort within partitions, write many files. Globally ordered by
    (file order × in-file order) without funneling through one task.
    """
    rp = (
        df.repartitionByRange(num_partitions, *range_cols)
        if num_partitions
        else df.repartitionByRange(*range_cols)
    )
    rp.sortWithinPartitions(*range_cols).write.mode("overwrite").parquet(path)
