"""Streaming heavy hitters (streaming/heavy_stream.py): the cumulative
Misra-Gries sketch + exact finalize must reproduce the batch operator's
exact top-k over everything ingested, stay bounded, and replay
idempotently."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from trace_parquet_spark.operators.heavy_hitters import CAPACITY, TOPK
from trace_parquet_spark.streaming.heavy_stream import (
    compact_heavy_state,
    finalize,
    heavy_committed_through,
    ingest_batch,
    run_heavy_stream,
)

# skewed vocabulary: token t{i} appears ~ N/(i+1) times per drop
# (Zipf-ish, so the true top-k counts sit far above N/CAPACITY)


def _drop(spark, seed: int, n_docs: int = 30):
    rows = []
    for d in range(n_docs):
        words = []
        for i in range(40):
            rank = (d * 40 + i + seed * 7) % 64
            words.append(f"t{rank // (1 + rank // 8)}")
        rows.append((seed * 1000 + d, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact_topk(spark, docs):
    from trace_parquet_spark.functions.text import tokens

    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(TOPK)
        .collect()
    )


def test_stream_equals_batch_exact_topk(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    drops = [_drop(spark, s) for s in range(3)]
    for i, d in enumerate(drops):
        d.coalesce(1).write.parquet(f"{src}/drop{i}.tmp")
        # one file per drop so maxFilesPerTrigger=1 → one batch per drop
        part = next(
            f
            for f in os.listdir(f"{src}/drop{i}.tmp")
            if f.endswith(".parquet")
        )
        os.rename(f"{src}/drop{i}.tmp/{part}", f"{src}/drop{i}.parquet")

    q = run_heavy_stream(spark, src, state, ckpt)
    q.processAllAvailable()
    q.stop()

    union = drops[0].unionByName(drops[1]).unionByName(drops[2])
    expected = _exact_topk(spark, union)
    got = finalize(spark, state).collect()
    assert [(r.token, r.n) for r in got] == [(r.token, r.n) for r in expected]


def test_ingest_replay_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    ingest_batch(spark, state, _drop(spark, 0), 0)
    ingest_batch(spark, state, _drop(spark, 1), 1)
    before = sorted(
        map(tuple, spark.read.parquet(f"{state}/mg/b1").collect())
    )
    # crash-replay of batch 1: same input, same id → same state
    ingest_batch(spark, state, _drop(spark, 1), 1)
    after = sorted(
        map(tuple, spark.read.parquet(f"{state}/mg/b1").collect())
    )
    assert before == after


def test_sketch_state_stays_bounded(spark, tmp_path):
    state = str(tmp_path / "state")
    for b in range(4):
        ingest_batch(spark, state, _drop(spark, b), b)
        n = spark.read.parquet(f"{state}/mg/b{b}").count()
        assert n <= CAPACITY


def test_compaction_bounds_dirs_and_preserves_finalize(spark, tmp_path):
    """12-batch run: compaction must bound the state dir count (mg
    grows one cumulative snapshot per batch without it), leave the
    possibly-replaying frontier batch untouched, and change nothing
    about finalize's exact top-k."""
    state = str(tmp_path / "state")
    drops = [_drop(spark, s, n_docs=6) for s in range(12)]
    for b, d in enumerate(drops):
        ingest_batch(spark, state, d, b)
    before = [(r.token, r.n) for r in finalize(spark, state).collect()]
    assert heavy_committed_through(state) == 10
    compact_heavy_state(spark, state)
    for fam in ("mg", "docs"):
        dirs = sorted(os.listdir(f"{state}/{fam}"))
        # one compacted dir + the frontier batch that may still replay
        assert dirs == ["b11", "c10"], dirs
    after = [(r.token, r.n) for r in finalize(spark, state).collect()]
    assert after == before
    # replay of the frontier batch after compaction is still idempotent
    ingest_batch(spark, state, drops[11], 11)
    assert [(r.token, r.n) for r in finalize(spark, state).collect()] == before
    # and a second compaction pass is a no-op at the same watermark
    compact_heavy_state(spark, state)
    assert [(r.token, r.n) for r in finalize(spark, state).collect()] == before


def test_many_batches_numeric_dir_order(spark, tmp_path):
    """12+ batches cross the b9/b10 lexicographic boundary: the merge
    base must be selected numerically, or counts from batches ≥ 10
    silently vanish (the sort-order bug class pinned for the dedup
    stream's state)."""
    state = str(tmp_path / "state")
    drops = [_drop(spark, s, n_docs=6) for s in range(12)]
    for b, d in enumerate(drops):
        ingest_batch(spark, state, d, b)
    union = drops[0]
    for d in drops[1:]:
        union = union.unionByName(d)
    expected = _exact_topk(spark, union)
    got = finalize(spark, state).collect()
    assert [(r.token, r.n) for r in got] == [(r.token, r.n) for r in expected]
