"""Streaming KLL quantiles (streaming/kll_stream.py): the streamed
answer must be BIT-IDENTICAL to a batch combine of the same delta
sketches (order-invariant multiset state), hold the sketch's own
rank-error bound against the exact concatenated-drop ranks, survive
replay, and be unchanged by compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from trace_parquet_spark.operators.kll import (
    KLL_Q_PPM,
    _OUT_SCHEMA,
    _merge_and_answer,
    _sketch_partition,
    _SKETCH_SCHEMA,
)
from trace_parquet_spark.sources.registry import load_table
from trace_parquet_spark.streaming.kll_stream import (
    compact_state,
    ingest_batch,
    latest_report,
    run_kll_stream,
)


def _drops(spark, sf_dir):
    vals = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("value"),
        (F.col("o_orderkey") % 3).alias("m"),
    )
    return [vals.filter(F.col("m") == i).select("value") for i in range(3)]


def test_stream_equals_batch_combine_and_holds_bound(spark, sf_dir, tmp_path):
    state = str(tmp_path / "state")
    drops = _drops(spark, sf_dir)
    for bid, d in enumerate(drops):
        ingest_batch(spark, state, d, bid)
    got = sorted(tuple(r) for r in latest_report(spark, state).collect())
    # batch combine of the SAME per-drop sketch rows — must be identical
    import os

    all_rows = spark.read.schema(_SKETCH_SCHEMA).parquet(
        *[os.path.join(state, "sketch", f"b{i}") for i in range(3)]
    )
    want = sorted(
        tuple(r)
        for r in all_rows.coalesce(1)
        .mapInPandas(_merge_and_answer, _OUT_SCHEMA)
        .collect()
    )
    assert got == want
    # the guarantee: |exact rank − target| <= the sketch's own bound
    values = sorted(
        r.value
        for d in drops
        for r in d.collect()
    )
    import bisect

    for q_ppm, est, n, target, bound in got:
        assert n == len(values)
        true_rank = bisect.bisect_right(values, est)
        assert abs(true_rank - target) <= bound, (q_ppm, true_rank, target)
    assert [r[0] for r in got] == sorted(KLL_Q_PPM)


def test_replay_and_compaction_keep_reports_identical(spark, sf_dir, tmp_path):
    import os

    state = str(tmp_path / "state")
    drops = _drops(spark, sf_dir)
    for bid, d in enumerate(drops):
        ingest_batch(spark, state, d, bid)
    before = sorted(tuple(r) for r in latest_report(spark, state).collect())
    # crashed foreachBatch replays its last batch — state must not drift
    ingest_batch(spark, state, drops[2], 2)
    assert sorted(tuple(r) for r in latest_report(spark, state).collect()) == before
    compact_state(spark, state)
    dirs = sorted(os.listdir(os.path.join(state, "sketch")))
    assert dirs == ["b2", "c1"], dirs
    # a post-compaction batch folds c-dir ∪ fresh rows identically:
    # replay batch 2 once more against the compacted base
    ingest_batch(spark, state, drops[2], 2)
    assert sorted(tuple(r) for r in latest_report(spark, state).collect()) == before


def test_checkpointed_stream_restart(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    drops = _drops(spark, sf_dir)
    drops[0].coalesce(1).write.mode("append").parquet(src)
    q = run_kll_stream(spark, src, state, ckpt)
    q.processAllAvailable(); q.stop()
    drops[1].coalesce(1).write.mode("append").parquet(src)
    q = run_kll_stream(spark, src, state, ckpt)
    q.processAllAvailable(); q.stop()
    rep = {r.q_ppm: r for r in latest_report(spark, state).collect()}
    n_expect = drops[0].count() + drops[1].count()
    assert all(r.n == n_expect for r in rep.values())
