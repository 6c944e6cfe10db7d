"""Kafka source/sink wrappers (gated — jar not in this image).

The streaming ingest path for trace rows at scale: Kafka topic of
(key=paramIndex, value=gzip blob + metadata). Requires the
spark-sql-kafka package on the classpath; absence surfaces as
``KafkaUnavailableError`` with setup instructions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SETUP_HINT = (
    "Kafka datasource not on classpath; add "
    "org.apache.spark:spark-sql-kafka-0-10_2.13 to spark.jars.packages"
)


class KafkaUnavailableError(RuntimeError):
    pass


def _gate(fn):
    try:
        return fn()
    except Exception as exc:  # noqa: BLE001
        if "kafka" in str(exc).lower():
            raise KafkaUnavailableError(_SETUP_HINT) from exc
        raise


def read_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, **options
) -> DataFrame:
    return _gate(
        lambda: spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .options(**options)
        .load()
    )


def write_stream(
    df: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str, **options
):
    return _gate(
        lambda: df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .options(**options)
        .start()
    )


# ---------------------------------------------------------------------------
# Wire-format handling — everything AFTER `.format("kafka").load()`.
#
# Spark's Kafka source always yields this exact relation (Structured
# Streaming Kafka integration docs):
#   key binary, value binary, topic string, partition int, offset long,
#   timestamp timestamp, timestampType int
# The decode stage below is source-agnostic: it only depends on that
# schema, so it is fully testable WITHOUT a broker — tests feed a
# memory/file stream shaped like KAFKA_RECORD_SCHEMA through it (the
# mock-integration coverage for this path; the broker jar only changes
# who produces the relation).
# ---------------------------------------------------------------------------

KAFKA_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def decode_json_records(records: DataFrame, value_schema: str) -> DataFrame:
    """Kafka wire records → typed rows: key as UTF-8 string, value as
    JSON parsed against ``value_schema``, tombstones (null value —
    Kafka's delete marker in compacted topics) preserved as null
    payload with is_tombstone=true so a downstream CDC merge can apply
    them. Keeps (partition, offset) for exactly-once bookkeeping and
    the broker timestamp for watermarks.

    Scale: pure projection (from_json / cast), codegen-friendly, no
    shuffle; safe directly under a watermark + window agg.
    """
    from pyspark.sql import functions as F

    return records.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias(
            "payload"
        ),
        F.col("value").isNull().alias("is_tombstone"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def latest_by_key(decoded: DataFrame) -> DataFrame:
    """Compacted-topic semantics as a BATCH operator: keep each key's
    record with the highest (partition-independent) offset ordering —
    (timestamp, offset) — honoring tombstones by dropping the key when
    the winning record is a delete. The batch twin of what a streaming
    CDC consumer materializes (streaming/cdc_sink.py)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("key").orderBy(
        F.desc("timestamp"), F.desc("offset"), F.desc("partition")
    )
    ranked = decoded.withColumn("rn", F.row_number().over(w))
    return (
        ranked.filter((F.col("rn") == 1) & (~F.col("is_tombstone")))
        .drop("rn")
    )
