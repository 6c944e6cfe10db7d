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
