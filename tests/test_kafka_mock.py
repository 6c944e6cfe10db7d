"""Mock-integration coverage of the Kafka path: Spark's Kafka source
always yields the fixed wire relation (KAFKA_RECORD_SCHEMA); these
tests produce that exact relation from parquet fixtures — batch AND
file-stream — and drive the decode → watermark → window pipeline that
a broker deployment would run, so everything after `.load()` is
exercised without the broker jar."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from trace_parquet_spark.sources.kafka import (
    KAFKA_RECORD_SCHEMA,
    decode_json_records,
    latest_by_key,
)
from trace_parquet_spark.streaming.pipeline import run_to_memory_sink

VALUE_SCHEMA = "user_id long, event_type string, value double"


def _wire_rows():
    """Synthetic compacted-topic history: three keys, updates and one
    tombstone, offsets increasing with time."""
    rows = []
    base = "2024-03-01 00:00:{:02d}"
    payloads = [
        ("u1", {"user_id": 1, "event_type": "view", "value": 1.0}, 0),
        ("u2", {"user_id": 2, "event_type": "view", "value": 2.0}, 1),
        ("u1", {"user_id": 1, "event_type": "purchase", "value": 9.5}, 2),
        ("u3", {"user_id": 3, "event_type": "click", "value": 3.0}, 3),
        ("u2", None, 4),  # tombstone: u2 erased
        ("u3", {"user_id": 3, "event_type": "purchase", "value": 7.0}, 5),
    ]
    for key, payload, off in payloads:
        rows.append(
            (
                key.encode(),
                None if payload is None else json.dumps(payload).encode(),
                "events",
                0,
                off,
                base.format(off),
                0,
            )
        )
    return rows


def _wire_df(spark):
    df = spark.createDataFrame(
        _wire_rows(),
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp string, timestampType int",
    )
    return df.withColumn("timestamp", F.col("timestamp").cast("timestamp"))


def test_decode_preserves_schema_and_tombstones(spark):
    decoded = decode_json_records(_wire_df(spark), VALUE_SCHEMA)
    rows = {(r.key, r.offset): r for r in decoded.collect()}
    assert len(rows) == 6
    assert rows[("u2", 4)].is_tombstone and rows[("u2", 4)].payload is None
    assert rows[("u1", 2)].payload.event_type == "purchase"
    assert rows[("u1", 2)].payload.value == 9.5


def test_compaction_applies_tombstones_and_latest_wins(spark):
    latest = latest_by_key(decode_json_records(_wire_df(spark), VALUE_SCHEMA))
    by_key = {r.key: r for r in latest.collect()}
    assert set(by_key) == {"u1", "u3"}  # u2 tombstoned away
    assert by_key["u1"].payload.event_type == "purchase"
    assert by_key["u3"].payload.value == 7.0


def test_streamed_wire_records_through_watermark_window(spark, tmp_path):
    # the same wire relation, as a FILE STREAM with the Kafka schema:
    # everything downstream of .load() is identical to a broker run
    src = str(tmp_path / "wire")
    _wire_df(spark).write.mode("overwrite").parquet(src)
    records = (
        spark.readStream.schema(
            KAFKA_RECORD_SCHEMA.replace("timestamp timestamp", "timestamp timestamp")
        )
        .parquet(src)
    )
    decoded = decode_json_records(records, VALUE_SCHEMA)
    windowed = (
        decoded.filter(~F.col("is_tombstone"))
        .withWatermark("timestamp", "10 minutes")
        .groupBy(F.window("timestamp", "1 minute"))
        .agg(F.count("*").alias("n"))
    )
    got = run_to_memory_sink(windowed, "kafka_mock_win", "complete").collect()
    assert sum(r.n for r in got) == 5  # 6 records minus the tombstone
