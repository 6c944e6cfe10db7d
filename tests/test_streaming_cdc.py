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


def test_vacuum_keeps_latest_versions(spark, sf_dir, tmp_path):
    from trace_parquet_spark.streaming.pipeline import vacuum_cdc_state

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(state, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.repartition(4).write.mode("overwrite").parquet(src)
    q = write_stream_cdc_upsert(
        _changes(read_events_stream(spark, src, max_files_per_trigger=1)),
        state,
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    before = sorted(d for d in os.listdir(state) if d.startswith("v"))
    assert len(before) >= 3
    final_before = read_cdc_state(spark, state).count()

    deleted = vacuum_cdc_state(state, keep=2)
    after = sorted(d for d in os.listdir(state) if d.startswith("v"))
    assert len(after) == 2 and set(after) | set(deleted) == set(before)
    # current state survives and is intact
    assert read_cdc_state(spark, state).count() == final_before


def test_observe_metrics_on_export_query(spark, sf_dir):
    """df.observe: accumulator metrics riding the real job — row count
    and value sum captured with NO extra pass over the data."""
    from pyspark.sql import Observation

    from trace_parquet_spark.operators.cdc import cdc_apply_latest

    obs = Observation("export_metrics")
    df = cdc_apply_latest(spark, sf_dir).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("last_value"), 2).alias("sum_value"),
    )
    rows = df.collect()
    m = obs.get
    assert m["n_rows"] == len(rows)
    assert m["sum_value"] == round(sum(r.last_value for r in rows), 2)
