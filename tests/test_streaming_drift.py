"""Streaming KS drift monitor (streaming/drift_stream.py): per-drop
score vs batch twin, shift detection, replay idempotence, restart."""

from __future__ import annotations

import pytest

from trace_parquet_spark.streaming.drift_stream import (
    drift_report,
    ingest_batch,
    run_drift_stream,
)


def _docs(spark, specs):
    # specs: list of (doc_id, length)
    return spark.createDataFrame(
        [(i, "x" * ln) for i, ln in specs], "doc_id long, text string"
    )


def _drops():
    base = [(i, 100 + (i % 7)) for i in range(40)]          # drop 0
    same = [(100 + i, 100 + (i % 7)) for i in range(40)]    # drop 1: same dist
    shifted = [(200 + i, 20 + (i % 3)) for i in range(40)]  # drop 2: shifted
    return base, same, shifted


def test_shift_detection_and_batch_twin(spark, tmp_path):
    state = str(tmp_path / "state")
    drops = _drops()
    for bid, rows in enumerate(drops):
        ingest_batch(spark, state, _docs(spark, rows), bid)
    rep = {r.batch_id: r for r in drift_report(spark, state).collect()}
    assert rep[0].ks_ppm is None and rep[0].n_ref == 0  # no baseline yet
    assert rep[1].n_ref == 40 and rep[2].n_ref == 80
    # identical distribution: near-zero drift; shifted: maximal drift
    assert rep[1].ks_ppm < 100_000
    assert rep[2].ks_ppm == 1_000_000  # disjoint supports -> D = 1
    # batch twin: recompute drop 2's KS directly with plain DataFrames
    from trace_parquet_spark.streaming.drift_stream import _ks_ppm
    from pyspark.sql import functions as F

    def hist(rows):
        return (
            _docs(spark, rows)
            .select(F.length("text").cast("long").alias("x"))
            .groupBy("x")
            .agg(F.count("*").cast("long").alias("c"))
        )

    want = _ks_ppm(hist(drops[2]), hist(drops[0] + drops[1]))
    assert rep[2].ks_ppm == want


def test_replay_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    drops = _drops()
    for bid, rows in enumerate(drops):
        ingest_batch(spark, state, _docs(spark, rows), bid)
    before = [tuple(r) for r in drift_report(spark, state).collect()]
    # crash-replay of batch 1: reads only state < 1, overwrites b1
    ingest_batch(spark, state, _docs(spark, drops[1]), 1)
    after = [tuple(r) for r in drift_report(spark, state).collect()]
    assert before == after


def test_stream_restart_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    drops = _drops()
    _docs(spark, drops[0]).coalesce(1).write.mode("append").parquet(src)
    _docs(spark, drops[1]).coalesce(1).write.mode("append").parquet(src)
    q = run_drift_stream(spark, src, state, ckpt)
    q.processAllAvailable()
    q.stop()
    _docs(spark, drops[2]).coalesce(1).write.mode("append").parquet(src)
    q = run_drift_stream(spark, src, state, ckpt)
    q.processAllAvailable()
    q.stop()
    rep = drift_report(spark, state).collect()
    assert len(rep) == 3
    assert rep[2].n_ref == 80
    assert rep[2].ks_ppm == 1_000_000
