"""Streaming corpus ingestion capstone (streaming/ingest_stream.py):
the quality→dedup→exactly-once-append composition must equal the batch
pipeline over everything ingested, survive crash-replay and restart,
and keep its fingerprint state bounded."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from trace_parquet_spark.functions.hashing import fingerprint_md5
from trace_parquet_spark.functions.text import (
    norm_text,
    quality_score_from,
    tokens,
)
from trace_parquet_spark.operators.corpus_pipeline import QUALITY_MIN
from trace_parquet_spark.sources.tablelog import latest_version, read_table
from trace_parquet_spark.streaming.ingest_stream import (
    compact_ingest_state,
    ingest_batch,
    ingest_committed_through,
    run_ingest_stream,
)

# Docs engineered so every gate fires: "x" repeated → low quality
# (length score tiny); long sentences pass; exact dups appear both
# within a drop and across drops (same normalized text, higher doc_id).
_GOOD = (
    "the quick brown fox jumps over the lazy dog and then the quick "
    "brown fox naps under a tree while the dog watches the road for "
    "carts and the afternoon passes slowly in the warm sun"
)


def _drop(spark, seed: int, n: int = 8):
    rows = []
    for i in range(n):
        doc_id = seed * 100 + i
        if i % 4 == 3:
            text = "x"  # fails the quality gate
        elif i % 4 == 2:
            text = f"{_GOOD} variant {seed}"  # in-drop dup of i%4==1
        elif i % 4 == 1:
            text = f"{_GOOD} variant {seed}"
        else:
            text = f"{_GOOD} cross {i}"  # same text in EVERY drop
        rows.append((doc_id, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_twin(spark, drops):
    """Quality filter + global keep-first in arrival order (batch
    index, then doc_id) — what the stream must converge to."""
    union = drops[0]
    for d in drops[1:]:
        union = union.unionByName(d)
    staged = union.select("doc_id", "text", tokens("text").alias("toks"))
    scored = staged.select(
        "doc_id",
        "text",
        quality_score_from("text", F.col("toks")).alias("quality"),
        fingerprint_md5(norm_text("text")).alias("content_fp"),
    ).filter(F.col("quality") >= QUALITY_MIN)
    # doc_ids are seed*100+i, so arrival order == doc_id order here
    keep = scored.groupBy("content_fp").agg(F.min("doc_id").alias("doc_id"))
    return scored.join(keep, ["content_fp", "doc_id"], "inner")


def _ingested_ids(spark, table):
    return sorted(r.doc_id for r in read_table(spark, table).collect())


def test_stream_equals_batch_pipeline(spark, tmp_path):
    state = str(tmp_path / "state")
    table = str(tmp_path / "t")
    drops = [_drop(spark, s) for s in range(3)]
    for b, d in enumerate(drops):
        ingest_batch(spark, state, table, d, b)
    expected = sorted(
        r.doc_id for r in _batch_twin(spark, drops).collect()
    )
    assert _ingested_ids(spark, table) == expected
    # the cross-drop duplicate text landed exactly once, from drop 0
    texts = [r.text for r in read_table(spark, table).collect()]
    assert len(texts) == len(set(texts))
    # quality gate really dropped the junk docs
    assert all(r.quality >= QUALITY_MIN for r in read_table(spark, table).collect())


def test_crash_replay_is_exactly_once(spark, tmp_path):
    state = str(tmp_path / "state")
    table = str(tmp_path / "t")
    drops = [_drop(spark, s) for s in range(2)]
    ingest_batch(spark, state, table, drops[0], 0)
    v1 = ingest_batch(spark, state, table, drops[1], 1)
    before = _ingested_ids(spark, table)
    # foreachBatch redelivery after a crash between state write and
    # offset commit: same input, same id → marker skips the append
    assert ingest_batch(spark, state, table, drops[1], 1) is None
    assert _ingested_ids(spark, table) == before
    assert latest_version(table) == v1


def test_restart_resumes_and_state_compacts(spark, tmp_path):
    import time

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    table = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    def publish(i, df):
        tmp = f"{src}/d{i}.tmp"
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.rename(f"{tmp}/{part}", f"{src}/drop{i}.parquet")

    drops = [_drop(spark, s) for s in range(3)]
    publish(0, drops[0])
    publish(1, drops[1])
    q = run_ingest_stream(spark, src, state, table, ck)
    q.processAllAvailable()
    q.stop()
    mid = _ingested_ids(spark, table)
    # restart the stream; a new drop arrives while it was down
    publish(2, drops[2])
    q = run_ingest_stream(spark, src, state, table, ck)
    deadline = time.time() + 90
    expected = sorted(
        r.doc_id for r in _batch_twin(spark, drops).collect()
    )
    try:
        while time.time() < deadline:
            if _ingested_ids(spark, table) == expected:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert _ingested_ids(spark, table) == expected
    assert len(mid) < len(expected)
    # state compaction: bounded dirs, dedup behavior unchanged after
    assert ingest_committed_through(state) == 1
    compact_ingest_state(spark, state)
    dirs = sorted(os.listdir(os.path.join(state, "fps")))
    assert dirs == ["b2", "c1"], dirs
    # a fourth drop that is ALL duplicates of earlier content must be
    # fully suppressed by the compacted store
    ingest_batch(spark, state, table, _drop(spark, 0), 3)
    assert _ingested_ids(spark, table) == expected
