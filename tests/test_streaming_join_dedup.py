"""Streaming dedup (dropDuplicatesWithinWatermark) and stream-stream
join semantics, driven through bounded file-source streams."""

from __future__ import annotations

import datetime

import pytest

from trace_parquet_spark.streaming.pipeline import (
    click_purchase_stream_join,
    dedup_events_stream,
    read_events_stream,
    run_to_memory_sink,
)

_T0 = datetime.datetime(2024, 1, 1, 10, 0, 0)


def _rows(*specs):
    # (event_id, minutes_after_t0, user_id, event_type, value)
    return [
        (
            eid,
            _T0 + datetime.timedelta(minutes=m),
            uid,
            etype,
            float(val),
            "{}",
        )
        for eid, m, uid, etype, val in specs
    ]


def _write(spark, path, rows):
    from trace_parquet_spark.streaming.pipeline import EVENTS_STREAM_SCHEMA

    spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_dedup_drops_redelivery(spark, tmp_path):
    src = str(tmp_path / "events")
    _write(
        spark,
        src,
        _rows(
            (1, 0, 7, "click", 1.0),
            (1, 1, 7, "click", 1.0),  # re-delivery of event 1
            (2, 2, 7, "click", 2.0),
            (2, 3, 7, "click", 2.0),  # re-delivery of event 2
            (3, 4, 8, "view", 3.0),
        ),
    )
    out = run_to_memory_sink(
        dedup_events_stream(read_events_stream(spark, src)),
        "dedup_sink",
        output_mode="append",
    )
    got = sorted(r.event_id for r in out.collect())
    assert got == [1, 2, 3]


def test_stream_stream_join_within_horizon(spark, tmp_path):
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    _write(
        spark,
        clicks_dir,
        _rows(
            (10, 0, 1, "click", 0.0),
            (11, 30, 1, "click", 0.0),
            (12, 0, 2, "click", 0.0),
        ),
    )
    _write(
        spark,
        buys_dir,
        _rows(
            (20, 40, 1, "purchase", 9.5),   # joins clicks 10 and 11
            (21, 200, 2, "purchase", 5.0),  # click 12 is 200min earlier: out
        ),
    )
    joined = click_purchase_stream_join(
        read_events_stream(spark, clicks_dir),
        read_events_stream(spark, buys_dir),
        horizon="1 hour",
    )
    out = run_to_memory_sink(joined, "ssjoin_sink", output_mode="append")
    rows = out.collect()
    pairs = sorted((r.purchase_id, r.click_id) for r in rows)
    assert pairs == [(20, 10), (20, 11)]
    assert all(r.click_ts <= r.purchase_ts for r in rows)


def test_stream_stream_left_outer_emits_after_watermark(spark, tmp_path):
    """Unmatched purchases appear null-padded ONLY once the watermark
    proves no matching click can still arrive; a purchase the
    watermark hasn't passed stays buffered (not emitted at all)."""
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    # first drops: one matched purchase, one orphan
    _write(spark, clicks_dir, _rows((10, 10, 1, "click", 0.0)))
    _write(
        spark,
        buys_dir,
        _rows(
            (20, 40, 1, "purchase", 9.5),  # joins click 10
            (21, 30, 2, "purchase", 5.0),  # orphan: no click for user 2
        ),
    )
    # second drops far in the future: push BOTH sides' watermarks past
    # orphan_ts + horizon so the null-padded row can be finalized
    _write(spark, clicks_dir, _rows((12, 600, 3, "click", 0.0)))
    _write(
        spark,
        buys_dir,
        _rows((22, 590, 4, "purchase", 1.0)),  # still inside watermark
    )
    joined = click_purchase_stream_join(
        read_events_stream(spark, clicks_dir),
        read_events_stream(spark, buys_dir),
        horizon="1 hour",
        how="left_outer",
    )
    out = run_to_memory_sink(joined, "ssjoin_outer_sink", output_mode="append")
    rows = {r.purchase_id: r for r in out.collect()}
    assert rows[20].click_id == 10  # matched normally
    assert rows[21].click_id is None  # orphan finalized null-padded
    assert rows[21].click_ts is None
    # purchase 22's no-match region is NOT yet watermark-closed: absent
    assert 22 not in rows


def test_stream_stream_full_outer_batch_twin_with_restart(spark, tmp_path):
    """FULL OUTER time-band join: BOTH sides' unmatched rows are
    finalized null-padded, each only at its own watermark close, and
    a checkpointed restart neither loses nor re-emits rows. The total
    emitted set (across both runs, once everything but the final
    watermark-pushers is closed) must equal the batch full-outer join
    of the same data — the batch twin pin."""
    import pyspark.sql.functions as F

    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    ckpt = str(tmp_path / "ckpt")

    # matched pair, one orphan purchase, one orphan click, plus
    # run-1 watermark pushers (minute 590/600) that stay OPEN in run 1
    _write(
        spark,
        clicks_dir,
        _rows(
            (10, 10, 1, "click", 0.0),   # matched by purchase 20
            (13, 20, 5, "click", 0.0),   # orphan click
            (12, 600, 3, "click", 0.0),  # run-1 pusher
        ),
    )
    _write(
        spark,
        buys_dir,
        _rows(
            (20, 40, 1, "purchase", 9.5),   # matches click 10
            (21, 30, 2, "purchase", 5.0),   # orphan purchase
            (22, 590, 4, "purchase", 1.0),  # run-1 pusher
        ),
    )

    def joined():
        return click_purchase_stream_join(
            read_events_stream(spark, clicks_dir),
            read_events_stream(spark, buys_dir),
            horizon="1 hour",
            how="full_outer",
        )

    out = str(tmp_path / "out")

    def run():
        # file sink, not memory: only a fault-tolerant sink supports
        # restarting from the checkpoint (exactly-once via its
        # _spark_metadata commit log)
        q = (
            joined()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.read.parquet(out).collect()

    run1 = run()
    by_pid = {r.purchase_id: r for r in run1 if r.purchase_id is not None}
    by_cid = {r.click_id: r for r in run1 if r.click_id is not None}
    assert by_pid[20].click_id == 10          # matched normally
    assert by_pid[21].click_id is None        # orphan purchase closed
    assert by_pid[21].user_id == 2            # user_id from the p side
    assert by_cid[13].purchase_id is None     # orphan CLICK closed too
    assert by_cid[13].user_id == 5            # user_id from the c side
    assert 22 not in by_pid                   # pushers still open:
    assert 12 not in by_cid                   # watermark hasn't passed

    # "downtime": run-2 pushers land, then restart on the SAME ckpt —
    # run 1's rows are not re-emitted; 22 and 12 now close null-padded
    _write(spark, clicks_dir, _rows((14, 2000, 6, "click", 0.0)))
    _write(spark, buys_dir, _rows((23, 1990, 7, "purchase", 1.0)))
    both = run()  # restart on the SAME checkpoint; sink accumulates
    ids1 = {(r.purchase_id, r.click_id) for r in run1}
    ids_all = [(r.purchase_id, r.click_id) for r in both]
    assert len(ids_all) == len(set(ids_all))  # nothing re-emitted twice
    run2 = [r for r in both if (r.purchase_id, r.click_id) not in ids1]
    ids2 = {(r.purchase_id, r.click_id) for r in run2}
    assert (22, None) in ids2 and (None, 12) in ids2

    # batch twin: full-outer join of everything except the still-open
    # run-2 pushers must equal the union of the two runs' outputs
    c = (
        spark.read.parquet(clicks_dir)
        .filter(~F.col("event_id").isin(14))
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    p = (
        spark.read.parquet(buys_dir)
        .filter(~F.col("event_id").isin(23))
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    twin = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")
        ),
        "full_outer",
    ).select(
        F.coalesce(F.col("p_user"), F.col("c_user")).alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        "purchase_value",
    )
    want = {tuple(r) for r in twin.collect()}
    got = {tuple(r) for r in run1} | {tuple(r) for r in run2}
    assert got == want
