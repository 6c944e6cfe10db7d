"""Watermark semantics: in append mode a window is emitted once the
watermark passes its end, and data arriving later than the watermark
is dropped — the state-bounding contract that makes streaming
aggregation feasible at scale."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from trace_parquet_spark.streaming.pipeline import (
    EVENTS_STREAM_SCHEMA,
    read_events_stream,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_late_rows_dropped_after_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = lambda i, ts, u=1: (i, datetime.fromisoformat(ts), u, "click", 1.0, "{}")

    # batch 1: two rows in the 10:00 window
    _write_batch(spark, src, [ev(1, "2024-01-01T10:05:00"), ev(2, "2024-01-01T10:20:00")])

    agg = (
        read_events_stream(spark, src)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # nothing emitted yet: watermark hasn't passed 11:00
        assert spark.sql("SELECT * FROM late_test").count() == 0

        # batch 2: 13:00 row advances watermark to 12:30 > 11:00
        _write_batch(spark, src, [ev(3, "2024-01-01T13:00:00")])
        q.processAllAvailable()
        got = {
            r.ws: r.n for r in spark.sql("SELECT * FROM late_test").collect()
        }
        assert got.get(datetime.fromisoformat("2024-01-01T10:00:00")) == 2

        # batch 3: a LATE row for the already-closed 10:00 window
        _write_batch(spark, src, [ev(4, "2024-01-01T10:30:00")])
        # plus a fresh row so the batch isn't empty
        _write_batch(spark, src, [ev(5, "2024-01-01T16:00:00")])
        q.processAllAvailable()
        got = {
            r.ws: r.n for r in spark.sql("SELECT * FROM late_test").collect()
        }
        # the 10:00 window was emitted once with n=2 and never updated:
        assert got[datetime.fromisoformat("2024-01-01T10:00:00")] == 2
        assert len([w for w in got if w == datetime.fromisoformat("2024-01-01T10:00:00")]) == 1
    finally:
        q.stop()
