"""foreachBatch exactly-once sink: checkpointed restart must resume
from recorded offsets and produce each input row exactly once across
the two runs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from trace_parquet_spark.sources.registry import load_table
from trace_parquet_spark.streaming.pipeline import (
    read_events_stream,
    write_stream_exactly_once,
)


def test_checkpointed_restart_no_duplicates(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    total = ev.count()
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)

    # run 1: only half the files exist; stream drains and stops
    half_a.repartition(2).write.mode("overwrite").parquet(src)
    q = write_stream_exactly_once(
        read_events_stream(spark, src, max_files_per_trigger=1), out, ckpt
    )
    q.processAllAvailable()
    q.stop()
    n_first = spark.read.parquet(out).count()
    assert n_first == half_a.count()

    # more files arrive while "down"; restart with the SAME checkpoint
    half_b.repartition(2).write.mode("append").parquet(src)
    q2 = write_stream_exactly_once(
        read_events_stream(spark, src, max_files_per_trigger=1), out, ckpt
    )
    q2.processAllAvailable()
    q2.stop()

    final = spark.read.parquet(out)
    assert final.count() == total                       # nothing lost
    assert final.select("event_id").distinct().count() == total  # nothing duplicated
    assert len(os.listdir(ckpt)) > 0
