"""Streaming incremental MinHash dedup: the foreachBatch screen must
(a) equal the batch-mode incremental twin on the same history/delta
split, (b) equal full batch LSH restricted to cross-batch pairs over
a multi-batch stream (the hot set is stable on this fixture, so no
signature drift), and (c) survive checkpointed restart — each batch's
state writes are batch-addressed, hence replay-idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from trace_parquet_spark.operators.dedup import dedup_minhash_lsh
from trace_parquet_spark.operators.incremental_dedup import (
    CUT_DEN,
    CUT_NUM,
    dedup_incremental_minhash,
)
from trace_parquet_spark.sources.registry import load_table
from trace_parquet_spark.streaming.dedup_stream import (
    read_hits,
    run_dedup_stream,
)


def _drain(q):
    q.processAllAvailable()
    q.stop()


def _hit_set(df):
    return {(r.doc_new, r.dup_of, r.jaccard) for r in df.collect()}


def test_two_batch_stream_matches_batch_incremental(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    cut = (max_id + 1) * CUT_NUM // CUT_DEN

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # batch 0: the history corpus arrives; stream drains and stops
    docs.filter(F.col("doc_id") < cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(run_dedup_stream(spark, src, state, ckpt))
    assert _hit_set(read_hits(spark, state)) == set()  # nothing to screen

    # batch 1: the delta drop arrives while "down"; restart resumes
    # from the checkpoint and screens delta x store only
    docs.filter(F.col("doc_id") >= cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(run_dedup_stream(spark, src, state, ckpt))

    got = _hit_set(read_hits(spark, state))
    expected = {
        (r.doc_new, r.dup_of, r.jaccard)
        for r in dedup_incremental_minhash(spark, sf_dir).collect()
    }
    assert got == expected
    assert got  # the fixture contains real cross-split near-dups


def test_multi_batch_stream_equals_cross_batch_lsh(spark, sf_dir, tmp_path):
    """Three sequential drops: the union of stream hits must equal
    full batch LSH restricted to cross-batch pairs (within-batch dups
    are deliberately not screened — same contract as the batch
    incremental twin)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    c1, c2 = (max_id + 1) // 3, 2 * (max_id + 1) // 3

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    chunks = [
        docs.filter(F.col("doc_id") < c1),
        docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
        docs.filter(F.col("doc_id") >= c2),
    ]
    for chunk in chunks:
        chunk.coalesce(1).write.mode("append").parquet(src)
        _drain(run_dedup_stream(spark, src, state, ckpt))

    def chunk_of(i: int) -> int:
        return 0 if i < c1 else (1 if i < c2 else 2)

    expected = {
        (r.doc_b, r.doc_a, r.jaccard)
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
        if chunk_of(r.doc_a) != chunk_of(r.doc_b)
    }
    assert _hit_set(read_hits(spark, state)) == expected


def test_df_state_batch_dirs_sort_numerically(spark, tmp_path):
    """Regression: batch dirs must order numerically, not
    lexicographically — 'b9' sorts after 'b10'..'b19' as strings, so a
    lexicographic dirs[-1] would silently revert the cumulative
    shingle-df merge base to the batch-9 snapshot from batch 11 on,
    permanently dropping batches >= 10 from the df state."""
    from trace_parquet_spark.streaming.dedup_stream import (
        _DF_SCHEMA,
        _batch_dirs,
        _latest_df_state,
    )

    state = str(tmp_path / "state")
    for b in range(12):  # b0..b11 — crosses the b9/b10 string boundary
        spark.createDataFrame([("x", b)], _DF_SCHEMA).write.mode(
            "overwrite"
        ).parquet(f"{state}/shingle_df/b{b}")

    dirs = _batch_dirs(state, "shingle_df", 12)
    assert [int(d.rsplit("b", 1)[1]) for d in dirs] == list(range(12))
    latest = _latest_df_state(spark, state, 12).collect()
    assert latest == [("x", 11)]  # the b11 snapshot, not b9


def test_twelve_batch_stream_accumulates_df_state(spark, sf_dir, tmp_path):
    """12 sequential drops (past the b9/b10 lexicographic boundary):
    the cumulative shingle-df snapshot after the last batch must equal
    a fresh batch-mode count over all ingested documents, and the
    union of hits must equal cross-batch LSH — proving no batch was
    dropped from the merge chain."""
    from trace_parquet_spark.operators.dedup import _shingles_of
    from trace_parquet_spark.streaming.dedup_stream import (
        _latest_df_state,
        ingest_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_batches = 12
    state = str(tmp_path / "state")

    for b in range(n_batches):
        ingest_batch(
            spark,
            state,
            docs.filter(F.col("doc_id") % n_batches == b),
            b,
        )

    got_df = {
        (r.s, r.df)
        for r in _latest_df_state(spark, state, n_batches).collect()
    }
    want_df = {
        (r.s, r.df)
        for r in _shingles_of(docs)
        .groupBy("s")
        .agg(F.count("*").cast("long").alias("df"))
        .collect()
    }
    assert got_df == want_df

    def batch_of(i: int) -> int:
        return i % n_batches

    # stream orientation: doc_new is whichever doc arrived in the
    # LATER batch (under the modulo split that is not always the
    # larger doc_id, unlike the contiguous splits above)
    expected = {
        (
            (r.doc_a, r.doc_b, r.jaccard)
            if batch_of(r.doc_a) > batch_of(r.doc_b)
            else (r.doc_b, r.doc_a, r.jaccard)
        )
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
        if batch_of(r.doc_a) != batch_of(r.doc_b)
    }
    assert _hit_set(read_hits(spark, state)) == expected
    assert expected  # fixture has real cross-batch near-dups


def test_stream_with_periodic_compaction_matches(spark, sf_dir, tmp_path):
    """The real writeStream path with compact_every: hits must equal
    the uncompacted 3-drop stream contract (cross-batch LSH), and the
    state must actually have been folded into a c dir."""
    import os

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    c1, c2 = (max_id + 1) // 3, 2 * (max_id + 1) // 3

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    chunks = [
        docs.filter(F.col("doc_id") < c1),
        docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
        docs.filter(F.col("doc_id") >= c2),
    ]
    for chunk in chunks:
        chunk.coalesce(1).write.mode("append").parquet(src)
        _drain(run_dedup_stream(spark, src, state, ckpt, compact_every=2))

    assert any(
        d.startswith("c") for d in os.listdir(os.path.join(state, "docs"))
    )

    def chunk_of(i: int) -> int:
        return 0 if i < c1 else (1 if i < c2 else 2)

    expected = {
        (r.doc_b, r.doc_a, r.jaccard)
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
        if chunk_of(r.doc_a) != chunk_of(r.doc_b)
    }
    assert _hit_set(read_hits(spark, state)) == expected


def test_state_compaction_preserves_semantics(spark, sf_dir, tmp_path):
    """Long stream (12 drops): compacting the batch-addressed state
    must (a) leave every state read identical, (b) bound the dir count
    (one c dir + uncommitted tail), (c) keep subsequent ingests and a
    replay of the first-uncommitted batch producing exactly the hits
    of an uncompacted replica run."""
    import os

    from trace_parquet_spark.streaming.dedup_stream import (
        DOC_SCHEMA,
        _SIG_SCHEMA,
        _latest_df_state,
        _read_batches,
        committed_through,
        compact_state,
        ingest_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_batches = 12

    def chunk(b):
        return docs.filter(F.col("doc_id") % n_batches == b)

    plain = str(tmp_path / "plain")
    comp = str(tmp_path / "comp")
    for b in range(10):
        ingest_batch(spark, plain, chunk(b), b)
        ingest_batch(spark, comp, chunk(b), b)

    # batch 9 is the newest => may still replay; compact through 8
    assert committed_through(comp) == 8
    before = {
        name: {tuple(r) for r in _read_batches(spark, comp, name, 10, sch).collect()}
        for name, sch in (("docs", DOC_SCHEMA), ("sigs", _SIG_SCHEMA))
    }
    df_before = {tuple(r) for r in _latest_df_state(spark, comp, 10).collect()}
    compact_state(spark, comp)

    for name, sch in (("docs", DOC_SCHEMA), ("sigs", _SIG_SCHEMA)):
        got = {tuple(r) for r in _read_batches(spark, comp, name, 10, sch).collect()}
        assert got == before[name], name
        assert sorted(os.listdir(os.path.join(comp, name))) == ["b9", "c8"]
    assert {tuple(r) for r in _latest_df_state(spark, comp, 10).collect()} == df_before
    # cumulative snapshots b0..b7 swept, c8 + b8? no — b8's snapshot
    # superseded by c8; only the replayable tail's snapshot remains
    assert sorted(os.listdir(os.path.join(comp, "shingle_df"))) == ["b9", "c8"]

    # replay batch 9 (the replayable one) post-compaction, then finish
    # the stream on both replicas
    ingest_batch(spark, comp, chunk(9), 9)
    for b in range(10, n_batches):
        ingest_batch(spark, plain, chunk(b), b)
        ingest_batch(spark, comp, chunk(b), b)

    assert _hit_set(read_hits(spark, comp)) == _hit_set(read_hits(spark, plain))

    # compacting twice at the same point is a no-op
    compact_state(spark, comp, through=8)
    assert sorted(os.listdir(os.path.join(comp, "docs"))) == [
        "b10", "b11", "b9", "c8"
    ]


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running a batch (foreachBatch replay after a crash between
    state write and offset commit) must leave state identical: every
    write is batch-addressed overwrite."""
    from trace_parquet_spark.streaming.dedup_stream import ingest_batch

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    cut = (max_id + 1) * CUT_NUM // CUT_DEN
    state = str(tmp_path / "state")

    ingest_batch(spark, state, docs.filter(F.col("doc_id") < cut), 0)
    ingest_batch(spark, state, docs.filter(F.col("doc_id") >= cut), 1)
    first = _hit_set(read_hits(spark, state))
    # replay batch 1 verbatim
    ingest_batch(spark, state, docs.filter(F.col("doc_id") >= cut), 1)
    assert _hit_set(read_hits(spark, state)) == first
