"""Streaming incremental semantic dedup (streaming/semantic_stream.py):
the foreachBatch embedding screen must (a) equal the batch LSH twin's
verified pair relation restricted to cross-batch pairs over a 3-drop
split (the hyperplane signature is a pure function of the vector, so
equality is EXACT — no drift caveat), (b) survive checkpointed
restart, (c) be replay-idempotent, and (d) preserve hits and state
under compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from trace_parquet_spark.operators.semantic import (
    SEM_MAX_ID,
    lsh_verified_pairs,
)
from trace_parquet_spark.sources.registry import load_table
from trace_parquet_spark.streaming.semantic_stream import (
    compact_state,
    ingest_batch,
    read_hits,
    run_semantic_stream,
)


def _drain(q):
    q.processAllAvailable()
    q.stop()


def _drop_of(vec_id: int) -> int:
    return vec_id % 3


def _drops(spark, sf_dir):
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < SEM_MAX_ID)
        .select("vec_id", "embedding")
    )
    return [emb.filter(F.col("vec_id") % 3 == i) for i in range(3)]


def _expected_cross_pairs(spark, sf_dir):
    """Batch twin pairs (src < dst) that straddle drops, keyed as the
    stream emits them: (vec_new = later drop's id, dup_of = earlier)."""
    out = set()
    for r in lsh_verified_pairs(spark, sf_dir).collect():
        da, db = _drop_of(r.src), _drop_of(r.dst)
        if da == db:
            continue
        new, old = (r.src, r.dst) if da > db else (r.dst, r.src)
        out.add((new, old))
    return out


def _hit_pairs(df):
    return {(r.vec_new, r.dup_of) for r in df.collect()}


def test_stream_equals_batch_lsh_on_three_drops(spark, sf_dir, tmp_path):
    state = str(tmp_path / "state")
    for bid, d in enumerate(_drops(spark, sf_dir)):
        ingest_batch(spark, state, d, bid)
    got = _hit_pairs(read_hits(spark, state))
    assert got == _expected_cross_pairs(spark, sf_dir)
    assert got, "fixture produced no cross-drop semantic pairs"
    # every emitted hit carries the exact cosine at/above the gate
    assert all(
        r.cos9 >= 0.42 for r in read_hits(spark, state).collect()
    )


def test_replay_idempotent_and_compaction_preserves(spark, sf_dir, tmp_path):
    import os

    state = str(tmp_path / "state")
    drops = _drops(spark, sf_dir)
    for bid, d in enumerate(drops):
        ingest_batch(spark, state, d, bid)
    before = _hit_pairs(read_hits(spark, state))
    # a crashed foreachBatch replays its last batch: state must not change
    ingest_batch(spark, state, drops[2], 2)
    assert _hit_pairs(read_hits(spark, state)) == before
    # compaction folds committed batches; reads resolve identically
    compact_state(spark, state)
    for name in ("vecs", "buckets"):
        dirs = sorted(os.listdir(os.path.join(state, name)))
        assert dirs == ["b2", "c1"], (name, dirs)
    assert _hit_pairs(read_hits(spark, state)) == before
    # the frontier batch can still replay against compacted state
    ingest_batch(spark, state, drops[2], 2)
    assert _hit_pairs(read_hits(spark, state)) == before


def test_checkpointed_restart_resumes(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    drops = _drops(spark, sf_dir)
    # drops arrive one at a time with a drain between the first two so
    # batch order deterministically matches drop order
    drops[0].coalesce(1).write.mode("append").parquet(src)
    _drain(run_semantic_stream(spark, src, state, ckpt))
    drops[1].coalesce(1).write.mode("append").parquet(src)
    _drain(run_semantic_stream(spark, src, state, ckpt))
    # third drop arrives while "down"; restart resumes from the offset
    drops[2].coalesce(1).write.mode("append").parquet(src)
    _drain(run_semantic_stream(spark, src, state, ckpt))
    got = _hit_pairs(read_hits(spark, state))
    assert got == _expected_cross_pairs(spark, sf_dir)
