"""Exactly-once streaming appends into the transaction-log table
format (sources/tablelog.py txn markers): replayed micro-batches land
once, restarts resume cleanly, and the result is a normal logged table
(time travel, change feed, optimize all apply)."""

from __future__ import annotations

import os

from trace_parquet_spark.sources.tablelog import (
    append_stream_batch,
    latest_version,
    read_table,
    run_append_stream,
    txn_committed,
)


def _ids(df):
    return sorted(r.id for r in df.collect())


def _write_drop(spark, src, i, lo, hi):
    tmp = f"{src}/d{i}.tmp"
    spark.range(lo, hi).coalesce(1).write.parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.rename(f"{tmp}/{part}", f"{src}/drop{i}.parquet")


def test_replayed_batch_lands_exactly_once(spark, tmp_path):
    t = str(tmp_path / "t")
    v0 = append_stream_batch(spark.range(5), t, "app", 0)
    assert v0 == 0 and txn_committed(t, "app", 0)
    # crash-replay of batch 0: same (app, batch_id) → skipped
    assert append_stream_batch(spark.range(5), t, "app", 0) is None
    assert latest_version(t) == 0
    assert _ids(read_table(spark, t)) == list(range(5))
    # a DIFFERENT app's batch 0 is a distinct transaction
    assert append_stream_batch(spark.range(5, 7), t, "other", 0) == 1
    assert _ids(read_table(spark, t)) == list(range(7))


def test_stream_then_restart_no_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_drop(spark, src, 0, 0, 10)
    _write_drop(spark, src, 1, 10, 20)

    q = run_append_stream(spark, src, "id long", t, ckpt)
    q.processAllAvailable()
    q.stop()
    assert _ids(read_table(spark, t)) == list(range(20))

    # new drop arrives; a RESTARTED stream (same checkpoint) must pick
    # up only the new file — no re-append of drops 0/1
    _write_drop(spark, src, 2, 20, 30)
    q2 = run_append_stream(spark, src, "id long", t, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert _ids(read_table(spark, t)) == list(range(30))
    # every version carries a txn marker; each batch exactly one commit
    assert latest_version(t) == 2


def test_streamed_table_supports_time_travel_and_feed(spark, tmp_path):
    from trace_parquet_spark.sources.tablelog import change_feed

    t = str(tmp_path / "t")
    append_stream_batch(spark.range(3), t, "app", 0)
    append_stream_batch(spark.range(3, 6), t, "app", 1)
    assert _ids(read_table(spark, t, as_of=0)) == [0, 1, 2]
    feed = change_feed(spark, t, 0, 1, "id").collect()
    assert sorted(r.id for r in feed) == [3, 4, 5]
    assert {r.change_type for r in feed} == {"insert"}
