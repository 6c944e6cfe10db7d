"""Structured Streaming: file-source micro-batches → watermark +
windows / session windows / custom stateful operator → memory sink,
cross-checked against the batch twins on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.operators.time_rollup import tumbling_window_agg
from trace_parquet_spark.sources.registry import load_table
from trace_parquet_spark.streaming.pipeline import (
    read_events_stream,
    run_to_memory_sink,
    running_user_totals,
    session_windows,
    windowed_counts,
)


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """events as 3 parquet files with µs TimestampType ts (the raw
    file is TIMESTAMP(NANOS), unusable as a stream source schema)."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.repartition(3).write.mode("overwrite").parquet(path)
    return path


def test_windowed_counts_match_batch(spark, sf_dir, stream_dir):
    stream = windowed_counts(read_events_stream(spark, stream_dir))
    got = run_to_memory_sink(stream, "win_counts", "complete").collect()
    batch = tumbling_window_agg(
        load_table(spark, sf_dir, "events").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
    ).collect()
    g = {(r.window_start, r.event_type): (r.n_events, r.total_value) for r in got}
    b = {(r.window_start, r.event_type): (r.n_events, r.total_value) for r in batch}
    assert g == b and len(g) > 0


def test_session_windows_stream(spark, stream_dir):
    stream = session_windows(read_events_stream(spark, stream_dir))
    rows = run_to_memory_sink(stream, "sess_win", "complete").collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)


def test_stateful_running_totals(spark, stream_dir):
    stream = running_user_totals(read_events_stream(spark, stream_dir))
    sink = run_to_memory_sink(stream, "run_tot", "update")
    # update mode emits one row per user per micro-batch: take the last
    final = (
        sink.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    )
    batch = (
        sink.sparkSession.read.parquet(stream_dir)
        .groupBy("user_id")
        .count()
        .collect()
    )
    g = {r.user_id: r.n_events for r in final}
    b = {r.user_id: r["count"] for r in batch}
    assert g == b
