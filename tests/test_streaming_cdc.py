"""Streaming CDC upsert sink: foreachBatch MERGE into a versioned
parquet state table must converge to exactly the batch CDC result
(operators/cdc.cdc_apply_latest), including across a checkpointed
restart — the lakehouse upsert-sink pattern without a table format."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from trace_parquet_spark.operators.cdc import DELETE_TYPE, cdc_apply_latest
from trace_parquet_spark.sources.registry import load_table
from trace_parquet_spark.streaming.pipeline import (
    read_cdc_state,
    read_events_stream,
    write_stream_cdc_upsert,
)


def _changes(ev):
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == DELETE_TYPE, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )


def test_streaming_cdc_converges_to_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(state, exist_ok=True)

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    early = ev.filter(F.col("event_id") % 3 != 0)
    late = ev.filter(F.col("event_id") % 3 == 0)

    early.repartition(3).write.mode("overwrite").parquet(src)
    q = write_stream_cdc_upsert(
        _changes(read_events_stream(spark, src, max_files_per_trigger=1)),
        state,
        ckpt,
    )
    q.processAllAvailable()
    q.stop()
    mid = read_cdc_state(spark, state)
    assert mid is not None and mid.count() > 0
    # several versions written, marker points at the newest
    versions = [d for d in os.listdir(state) if d.startswith("v")]
    assert len(versions) >= 2

    # "downtime": more changes arrive; restart from the same checkpoint
    late.repartition(2).write.mode("append").parquet(src)
    q2 = write_stream_cdc_upsert(
        _changes(read_events_stream(spark, src, max_files_per_trigger=1)),
        state,
        ckpt,
    )
    q2.processAllAvailable()
    q2.stop()

    final = read_cdc_state(spark, state)
    expect = cdc_apply_latest(spark, sf_dir)
    got = final.select(
        "user_id",
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
        F.col("event_id").alias("last_event_id"),
    )
    # the engine's parquet sink writes TIMESTAMP_MILLIS (reference
    # parity, session.py) — the streamed state legitimately truncates
    # micros, so truncate the batch expectation the same way
    exp = expect.withColumn(
        "last_ts",
        F.date_trunc("millisecond", F.col("last_ts").cast("timestamp")),
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
