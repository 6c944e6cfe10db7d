"""Streaming corpus ingestion: the capstone composition of the
engine's LLM-pipeline pieces as ONE exactly-once stream —

    document drops  →  quality gate  →  exact dedup vs everything
    previously ingested  →  transaction-logged table append

Per micro-batch (foreachBatch):

1. score each doc with the batch pipeline's own quality heuristic
   (functions/text.quality_score_from — same expression, so the
   stream and corpus_clean agree by construction) and drop docs below
   QUALITY_MIN;
2. exact-dedup: keep the min-doc_id row per content fingerprint
   WITHIN the batch, then anti-join against the fingerprint store of
   all prior batches (batch-addressed parquet state, the
   dedup_stream/heavy_stream lakehouse-state pattern — replays
   overwrite their own ``fps/b{N}`` dir, so redelivery is idempotent);
3. append the survivors to a tablelog table via
   ``append_stream_batch`` — the (app, batch_id) transaction marker
   makes the append exactly-once even when a crash lands between the
   state write and the offset commit.

The result table is pinned equal to the BATCH twin (quality filter +
global keep-first in arrival order) in tests/test_streaming_ingest.py,
including across crash-replay and checkpoint restart; fingerprint
state dirs are bounded by ``compact_ingest_state`` under the same
committed-through contract as the dedup/drift/heavy families.

Scale: the only per-batch work proportional to history is the
fingerprint anti-join — fingerprints are 32-byte keys hash-partitioned
on content_fp, so the join is shuffle-bounded by |delta| + |store|/P
per executor; the doc payloads of prior batches are never re-read.

Reference: no counterpart (single-query export engine); north-star
§2.9 streaming × corpus-hygiene intersection.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import fingerprint_md5
from ..functions.text import norm_text, quality_score_from, tokens
from ..operators.corpus_pipeline import QUALITY_MIN
from ..sources.tablelog import append_stream_batch, txn_committed
from .dedup_stream import DOC_SCHEMA, _batch_dirs, _read_batches

_FP_SCHEMA = "content_fp string"


def _scored(batch_df: DataFrame) -> DataFrame:
    staged = batch_df.select(
        "doc_id", "text", tokens("text").alias("toks")
    )
    return staged.select(
        "doc_id",
        "text",
        quality_score_from("text", F.col("toks")).alias("quality"),
        fingerprint_md5(norm_text("text")).alias("content_fp"),
    )


def ingest_batch(
    spark: SparkSession,
    state_dir: str,
    table: str,
    batch_df: DataFrame,
    bid: int,
    app: str = "corpus-ingest",
) -> int | None:
    """Quality-gate, dedup, and exactly-once-append one drop. Returns
    the committed tablelog version, or None on a replayed batch."""
    w = Window.partitionBy("content_fp").orderBy("doc_id")
    in_batch = (
        _scored(batch_df)
        .filter(F.col("quality") >= QUALITY_MIN)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    hist = _read_batches(spark, state_dir, "fps", bid, _FP_SCHEMA)
    fresh = in_batch.join(hist, "content_fp", "left_anti")
    # state first, then the marker-guarded append: a crash between the
    # two replays into an identical state overwrite + a skipped append
    fresh.select("content_fp").write.mode("overwrite").parquet(
        os.path.join(state_dir, "fps", f"b{bid}")
    )
    if txn_committed(table, app, bid):
        return None
    return append_stream_batch(
        fresh.select("doc_id", "text", "quality", "content_fp"),
        table,
        app,
        bid,
    )


def ingest_committed_through(state_dir: str) -> int | None:
    root = os.path.join(state_dir, "fps")
    if not os.path.isdir(root):
        return None
    ids = [
        int(d[1:])
        for d in os.listdir(root)
        if d[:1] in ("b", "c") and d[1:].isdigit()
    ]
    return max(ids) - 1 if ids else None


def compact_ingest_state(
    spark: SparkSession, state_dir: str, through: int | None = None
) -> None:
    """Merge committed fingerprint dirs into one ``c{N}`` — the same
    crash-safe chore as the dedup/drift/heavy families (tmp write,
    atomic rename, then cleanup; the possibly-replaying frontier batch
    is never touched)."""
    import shutil

    if through is None:
        through = ingest_committed_through(state_dir)
    if through is None or through < 0:
        return
    root = os.path.join(state_dir, "fps")
    dirs = _batch_dirs(state_dir, "fps", through + 1)
    if not dirs or dirs == [os.path.join(root, f"c{through}")]:
        return
    merged = spark.read.schema(_FP_SCHEMA).parquet(*dirs)
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


def run_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    table: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Attach the ingestion pipeline to a parquet-file document stream
    (one file ≈ one drop); offsets live in the checkpoint, so a
    restart resumes exactly where the previous run stopped."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, state_dir, table, batch_df, batch_id)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
