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
