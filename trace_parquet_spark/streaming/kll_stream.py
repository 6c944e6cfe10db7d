"""Streaming KLL quantiles: a value stream summarized batch by batch
with the deterministic KLL sketch — completing the streaming × sketch
intersection (heavy hitters: heavy_stream.py, drift: drift_stream.py,
rank/quantile: here).

The state is the MULTISET of per-partition sketch rows accumulated so
far (operators/kll.py's (level, value) relation plus its count/error
carrier rows) — a pure append-union, which makes every property free:
the per-batch answer is _merge_and_answer over all rows, and because
that combine depends only on the level multisets (order-invariance
pinned in tests/test_kll.py), the streamed answer over N drops is
IDENTICAL to a batch combine of the same delta sketches — not merely
within-bound-equivalent. Batch-addressed writes keep replays
idempotent; compaction is file-level only (the state is already the
thing to keep), so reports are bit-identical across it.

Per micro-batch (``ingest_batch``, driven by foreachBatch):
1. sketch the DELTA distributed (mapInPandas, Arrow-batched) and
   append its rows as ``sketch/b{N}``;
2. combine ALL sketch rows (≤ partitions·K·levels per batch — sketch
   rows only, never data) and write the quantile report ``report/b{N}``.

Reference: no counterpart (single-query export engine); north-star
extension alongside the batch kll_quantile_sketch entry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.kll import _SKETCH_SCHEMA, _OUT_SCHEMA, _merge_and_answer, _sketch_partition
from .dedup_stream import _batch_dirs, _read_batches, _target_files

VALUE_SCHEMA = "value long"


def ingest_batch(
    spark: SparkSession, state_dir: str, delta_values: DataFrame, batch_id: int
) -> None:
    """Fold one arriving value batch into the sketch state and emit
    the post-batch quantile report. Ordinary batch function — tests
    replay it directly."""
    bid = int(batch_id)
    delta_rows = delta_values.select("value").mapInPandas(
        _sketch_partition, _SKETCH_SCHEMA
    )
    sk_path = os.path.join(state_dir, "sketch", f"b{bid}")
    delta_rows.write.mode("overwrite").parquet(sk_path)

    all_rows = _read_batches(
        spark, state_dir, "sketch", bid + 1, _SKETCH_SCHEMA
    )
    report = all_rows.coalesce(1).mapInPandas(_merge_and_answer, _OUT_SCHEMA)
    report.write.mode("overwrite").parquet(
        os.path.join(state_dir, "report", f"b{bid}")
    )


def committed_through(state_dir: str) -> int | None:
    root = os.path.join(state_dir, "sketch")
    if not os.path.isdir(root):
        return None
    ids = [
        int(d[1:])
        for d in os.listdir(root)
        if d[:1] in ("b", "c") and d[1:].isdigit()
    ]
    return max(ids) - 1 if ids and max(ids) >= 1 else None


def compact_state(
    spark: SparkSession,
    state_dir: str,
    through: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> None:
    """Fold committed sketch dirs into one ``c{through}`` (the state
    is an append-union multiset, so compaction is purely file-level
    and every later answer is bit-identical); per-batch reports stay
    addressed for consumers. Crash-safe tmp+rename publish."""
    import shutil

    if through is None:
        through = committed_through(state_dir)
    if through is None:
        return
    root = os.path.join(state_dir, "sketch")
    dirs = _batch_dirs(state_dir, "sketch", through + 1)
    if not dirs or dirs == [os.path.join(root, f"c{through}")]:
        return
    merged = spark.read.schema(_SKETCH_SCHEMA).parquet(*dirs)
    tmp = os.path.join(root, f"tmp_c{through}")
    n = _target_files(spark, root, target_file_bytes)
    merged.coalesce(n).write.mode("overwrite").parquet(tmp)
    final = os.path.join(root, f"c{through}")
    os.rename(tmp, final)  # atomic publish
    for d in os.listdir(root):
        if (
            d[:1] in ("b", "c")
            and d[1:].isdigit()
            and int(d[1:]) <= through
            and os.path.join(root, d) != final
        ):
            shutil.rmtree(os.path.join(root, d))


def run_kll_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    compact_every: int | None = None,
):
    """Attach the sketch fold to a parquet-file value stream."""
    stream = (
        spark.readStream.schema(VALUE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, state_dir, batch_df, batch_id)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_state(spark, state_dir)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def latest_report(spark: SparkSession, state_dir: str) -> DataFrame:
    """The newest post-batch quantile report."""
    root = os.path.join(state_dir, "report")
    bid = max(
        int(d[1:]) for d in os.listdir(root) if d[1:].isdigit()
    )
    return spark.read.schema(_OUT_SCHEMA).parquet(
        os.path.join(root, f"b{bid}")
    )
