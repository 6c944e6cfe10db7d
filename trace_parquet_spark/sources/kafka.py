"""Kafka source/sink wrappers (gated — jar not in this image).

The streaming ingest path for trace rows at scale: Kafka topic of
(key=paramIndex, value=gzip blob + metadata). Requires the
spark-sql-kafka package on the classpath; we probe lazily and raise
``KafkaUnavailableError`` with setup instructions otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class KafkaUnavailableError(RuntimeError):
    pass


def _probe(spark: SparkSession) -> None:
    try:
        spark.read.format("kafka")
        jvm_ok = (
            spark._jvm.org.apache.spark.sql.kafka010 is not None  # type: ignore[attr-defined]
        )
        if not jvm_ok:  # pragma: no cover
            raise KafkaUnavailableError("kafka010 classes missing")
    except Exception as exc:  # noqa: BLE001
        raise KafkaUnavailableError(
            "Kafka datasource not on classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 to spark.jars.packages"
        ) from exc


def read_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, **options
) -> DataFrame:
    _probe(spark)
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .options(**options)
        .load()
    )


def write_stream(
    df: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str, **options
):
    _probe(df.sparkSession)
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .options(**options)
        .start()
    )
