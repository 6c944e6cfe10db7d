"""Streaming heavy hitters: exact corpus top-k maintained over a
document stream with bounded-memory state.

The streaming twin of operators/heavy_hitters.py, built on the same
candidate-propose / exact-verify split:

- per micro-batch, the DELTA's tokens run through the per-partition
  Misra-Gries sketch (counts retained, not just tokens), and the
  partition sketches are merged with the previous cumulative sketch:
  sum counts by token, then apply the standard MG truncation (subtract
  the (CAPACITY+1)-th largest count, keep positives). MG summaries are
  mergeable with the additive error bound (Agarwal et al., "Mergeable
  Summaries", PODS 2012): the cumulative sketch undercounts any token
  by at most N/CAPACITY over the whole stream, so every token with
  true count > N/CAPACITY is still present — the same pigeonhole
  guarantee the batch operator relies on, carried across batches;
- the sketch state is one parquet relation of ≤ CAPACITY rows per
  snapshot, batch-addressed (``mg/b{N}`` = cumulative sketch AFTER
  batch N) so foreachBatch replays are idempotent — the lakehouse-
  state pattern shared with streaming/dedup_stream.py. Ingested docs
  are retained under ``docs/b{N}`` (the corpus store a dedup/quality
  pipeline keeps anyway);
- ``finalize`` answers the exact top-k at any point: ONE recount scan
  of the stored corpus restricted (semi-join) to the sketch's
  candidate tokens — identical to the batch operator's second pass,
  so the result is the EXACT top-k of everything ingested, pinned
  equal to ``top_tokens_exact`` over the concatenated drops in
  tests/test_streaming_heavy.py.

Scale: per batch the shuffle carries ≤ partitions × CAPACITY sketch
rows plus the delta's tokens once; the cumulative state never exceeds
CAPACITY rows; finalize is the only corpus-wide scan and is restricted
to the broadcast candidate set before its shuffle.

Reference: no counterpart (single-query export engine); north-star
extension at the §2.9 streaming × text-analysis intersection.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.heavy_hitters import CAPACITY, TOPK
from .dedup_stream import DOC_SCHEMA, _batch_dirs, _read_batches

_MG_SCHEMA = "token string, cnt long"


def _mg_sketch_counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries over (token[, cnt]) rows, emitting the
    surviving counters WITH their residual counts (the mergeable form).
    Accepts either raw token rows or pre-counted (token, cnt) rows, so
    the same kernel folds a delta's tokens and merges sketch relations."""
    counts: pd.Series = pd.Series(dtype="int64")
    for pdf in batches:
        if "cnt" in pdf.columns:
            batch = pdf.groupby("token")["cnt"].sum()
        else:
            batch = pdf["token"].value_counts()
        counts = counts.add(batch, fill_value=0).astype("int64")
        if len(counts) > CAPACITY:
            counts = counts.sort_values(ascending=False)
            d = int(counts.iloc[CAPACITY])
            counts = counts.iloc[:CAPACITY] - d
            counts = counts[counts > 0]
    yield pd.DataFrame(
        {"token": counts.index.astype(str), "cnt": counts.values}
    )


def _latest_sketch(spark: SparkSession, state_dir: str, below: int) -> DataFrame:
    dirs = _batch_dirs(state_dir, "mg", below)
    if not dirs:
        return spark.createDataFrame([], _MG_SCHEMA)
    return spark.read.schema(_MG_SCHEMA).parquet(dirs[-1])


def ingest_batch(
    spark: SparkSession, state_dir: str, batch_df: DataFrame, bid: int
) -> None:
    """Fold one document drop into the cumulative sketch and the doc
    store. Reads only state strictly before ``bid`` and overwrites its
    own batch-addressed outputs — replay-idempotent."""
    batch_df = batch_df.select("doc_id", "text")
    delta_toks = batch_df.select(
        F.explode(tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    delta_sketch = delta_toks.mapInPandas(_mg_sketch_counts, schema=_MG_SCHEMA)
    prev = _latest_sketch(spark, state_dir, bid)
    # merge: previous cumulative + delta partition sketches → coalesce(1)
    # so the final truncation sees ALL counters (the relation is tiny:
    # ≤ CAPACITY·(partitions+1) rows), then MG-truncate to CAPACITY.
    merged = (
        prev.unionByName(delta_sketch)
        .coalesce(1)
        .mapInPandas(_mg_sketch_counts, schema=_MG_SCHEMA)
    )
    merged.write.mode("overwrite").parquet(
        os.path.join(state_dir, "mg", f"b{bid}")
    )
    batch_df.write.mode("overwrite").parquet(
        os.path.join(state_dir, "docs", f"b{bid}")
    )


def finalize(spark: SparkSession, state_dir: str, below: int | None = None) -> DataFrame:
    """Exact top-k over everything ingested (batches < ``below``, or
    all): recount the stored corpus restricted to the cumulative
    sketch's candidates — the batch operator's verify pass over the
    streaming state."""
    if below is None:
        root = os.path.join(state_dir, "docs")
        ids = [
            int(d[1:])
            for d in os.listdir(root)
            if d[:1] in ("b", "c") and d[1:].isdigit()
        ]
        below = max(ids) + 1
    candidates = _latest_sketch(spark, state_dir, below).select("token")
    docs = _read_batches(spark, state_dir, "docs", below, DOC_SCHEMA)
    toks = docs.select(F.explode(tokens("text")).alias("token")).filter(
        F.col("token") != ""
    )
    return (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(TOPK)
    )


def heavy_committed_through(state_dir: str) -> int | None:
    """Highest batch id that can no longer replay (the dedup-stream
    contract: foreachBatch commits batch N's offsets before N+1
    starts, so only the newest on-disk batch may replay)."""
    root = os.path.join(state_dir, "mg")
    if not os.path.isdir(root):
        return None
    ids = [
        int(d[1:])
        for d in os.listdir(root)
        if d[:1] in ("b", "c") and d[1:].isdigit()
    ]
    return max(ids) - 1 if ids else None


def compact_heavy_state(
    spark: SparkSession, state_dir: str, through: int | None = None
) -> None:
    """Bound the sketch/corpus state-dir growth on unbounded streams —
    the same chore dedup_stream.compact_state and
    drift_stream.compact_drift_state perform, so the heavy-hitter
    family keeps the identical operational contract: ``mg`` holds
    CUMULATIVE ≤CAPACITY-row snapshots (only the newest matters —
    rewritten as ``c{N}``, superseded dirs dropped), ``docs`` is the
    append-union corpus store (merged into one ``c{N}``). Only
    batches that can no longer replay are touched; readers resolve
    c ∪ later-b dirs to identical rows, so ``finalize`` output is
    unchanged (pinned in tests/test_streaming_heavy.py). Crash-safe:
    tmp-write, atomic rename, then cleanup."""
    import shutil

    if through is None:
        through = heavy_committed_through(state_dir)
    if through is None or through < 0:
        return

    def swap_in(merged: DataFrame, root: str) -> None:
        tmp = os.path.join(root, f"tmp_c{through}")
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        final = os.path.join(root, f"c{through}")
        os.rename(tmp, final)
        for d in os.listdir(root):
            if (
                d[:1] in ("b", "c")
                and d[1:].isdigit()
                and int(d[1:]) <= through
                and os.path.join(root, d) != final
            ):
                shutil.rmtree(os.path.join(root, d))

    for name, schema, snapshot in (
        ("mg", _MG_SCHEMA, True),
        ("docs", DOC_SCHEMA, False),
    ):
        root = os.path.join(state_dir, name)
        dirs = _batch_dirs(state_dir, name, through + 1)
        if not dirs or dirs == [os.path.join(root, f"c{through}")]:
            continue
        src = [dirs[-1]] if snapshot else dirs
        swap_in(spark.read.schema(schema).parquet(*src), root)


def run_heavy_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Attach the sketch maintenance to a parquet-file document stream
    (one file ≈ one drop). Offsets live in the checkpoint; a restart
    resumes exactly where the previous run stopped."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, state_dir, batch_df, batch_id)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
