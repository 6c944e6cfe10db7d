"""Chained stateful streaming operators (Spark 4 multi-stateful
support): stream-stream time-band join → windowed aggregation in ONE
append-mode query — batch-twin equality and checkpointed restart."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from trace_parquet_spark.streaming.pipeline import (
    EVENTS_STREAM_SCHEMA,
    attributed_revenue_windows,
    click_purchase_stream_join,
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
    spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


# clicks/purchases fixture: three users, purchases landing in two
# distinct hourly windows, one purchase outside the horizon (dropped
# by the join), plus far-future low-value flush events (user 99) that
# push BOTH sides' watermarks past every real window so append mode
# finalizes them; the flush purchase has no prior click, so it never
# reaches the window aggregation itself.
_CLICKS_MAIN = (
    (10, 0, 1, "click", 0.0),
    (11, 30, 1, "click", 0.0),
    (12, 5, 2, "click", 0.0),
    (13, 70, 3, "click", 0.0),
)
_FLUSH_CLICK = ((98, 24 * 60, 99, "click", 0.0),)
_BUYS_MAIN = (
    (20, 40, 1, "purchase", 9.5),  # window [10:00,11:00): clicks 10+11 → 2 rows
    (21, 50, 2, "purchase", 5.0),  # window [10:00,11:00): click 12 → 1 row
)
_BUYS_REST = (
    (22, 90, 3, "purchase", 7.25),  # window [11:00,12:00): click 13 → 1 row
    (23, 300, 2, "purchase", 4.0),  # click 12 is 295 min earlier: outside horizon
)
_FLUSH_BUY = ((99, 24 * 60 + 1, 99, "purchase", 1.0),)
_CLICKS = _CLICKS_MAIN + _FLUSH_CLICK
_BUYS = _BUYS_MAIN + _BUYS_REST + _FLUSH_BUY


def _expected_batch(spark):
    """Batch twin: same band join + hourly rollup over the static data."""
    c = spark.createDataFrame(_rows(*_CLICKS), EVENTS_STREAM_SCHEMA)
    p = spark.createDataFrame(_rows(*_BUYS), EVENTS_STREAM_SCHEMA)
    joined = click_purchase_stream_join(c, p, horizon="1 hour")
    return {
        (r.window_start, r.n_attributed, r.revenue)
        for r in joined.groupBy(F.window("purchase_ts", "1 hour"))
        .agg(
            F.count("*").alias("n_attributed"),
            F.round(F.sum("purchase_value"), 2).alias("revenue"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_attributed",
            "revenue",
        )
        .collect()
        # the flush purchase joins the flush click (same user 99, 1 min
        # apart) — its far-future window is the one window the final
        # watermark does NOT close, so the streaming run never emits it
        if r.window_start < _T0 + datetime.timedelta(hours=23)
    }


def test_chained_join_then_window_matches_batch(spark, tmp_path):
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    _write(spark, clicks_dir, _rows(*_CLICKS))
    _write(spark, buys_dir, _rows(*_BUYS))

    out = run_to_memory_sink(
        attributed_revenue_windows(
            read_events_stream(spark, clicks_dir),
            read_events_stream(spark, buys_dir),
            width="1 hour",
            horizon="1 hour",
        ),
        "chained_sink",
        output_mode="append",
    )
    got = {(r.window_start, r.n_attributed, r.revenue) for r in out.collect()}
    expected = _expected_batch(spark)
    assert got == expected and len(expected) == 2


def test_chained_query_survives_checkpointed_restart(spark, tmp_path):
    """Deliver half the purchases, stop, deliver the rest, restart on
    the SAME checkpoint: both stateful operators' state (join buffers
    + window partials) must resume — final output identical to the
    single-run case, nothing duplicated."""
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # run 1 gets only the real clicks and the first window's purchases;
    # the flush events arrive on BOTH sides after the restart — under
    # the min multiple-watermark policy a side with no fresh data holds
    # the global watermark back, so the flush must be post-restart
    # traffic for the restarted query to finalize anything at all
    _write(spark, clicks_dir, _rows(*_CLICKS_MAIN))
    _write(spark, buys_dir, _rows(*_BUYS_MAIN))

    def start():
        return (
            attributed_revenue_windows(
                read_events_stream(spark, clicks_dir),
                read_events_stream(spark, buys_dir),
                width="1 hour",
                horizon="1 hour",
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()

    # the rest arrives while "down" (incl. the watermark flush, on
    # both sides)
    _write(spark, buys_dir, _rows(*(_BUYS_REST + _FLUSH_BUY)))
    _write(spark, clicks_dir, _rows(*_FLUSH_CLICK))
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    got = {
        (r.window_start, r.n_attributed, r.revenue)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == _expected_batch(spark)


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static dimension join → windowed rollup: complete-mode
    streaming result must equal the identical batch computation, and
    facts without a dimension row must survive as 'unknown'."""
    from trace_parquet_spark.sources.registry import load_table
    from trace_parquet_spark.streaming.pipeline import (
        enriched_windowed_counts,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "events_src")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    # segment dimension derived from customer: covers only SOME users
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.concat(F.lit("seg_"), (F.col("c_custkey") % 3).cast("string")
                     ).alias("segment"),
        )
        .filter(F.col("user_id") % 2 == 0)  # odd users → 'unknown'
    )

    stream_out = run_to_memory_sink(
        enriched_windowed_counts(read_events_stream(spark, src), dim),
        "enriched_sink",
        output_mode="complete",
    ).collect()
    batch_out = enriched_windowed_counts(ev, dim).collect()

    key = lambda r: (r.window_start, r.segment)
    g = {key(r): (r.n_events, r.total_value) for r in stream_out}
    b = {key(r): (r.n_events, r.total_value) for r in batch_out}
    assert g == b and len(g) > 0
    assert any(seg == "unknown" for _, seg in g)  # left-join semantics
