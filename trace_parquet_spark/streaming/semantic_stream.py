"""Streaming incremental SEMANTIC dedup: an embedding stream screened
against the accumulated corpus in hyperplane-LSH bucket space, batch
by batch — the embedding-space sibling of streaming/dedup_stream.py
(round-6 verdict item 7), completing the streaming family's coverage
of the batch dedup stack (exact + MinHash + semantic).

The incremental_dedup asymmetry applied to hyperplane buckets: each
arriving batch is bucketed once, its membership rows band-joined
against the ACCUMULATED bucket store (delta × store collisions only —
history never re-pairs against itself), and candidates are verified
with exact cosine before a hit is emitted. Because the bucket
signature is a deterministic pure function of the vector (unlike the
MinHash screen, whose df-cap drifts with corpus vocabulary), the
union of stream hits over any drop sequence equals the batch twin's
verified pair relation (operators/semantic.lsh_verified_pairs)
restricted to cross-batch pairs EXACTLY — pinned in
tests/test_streaming_semantic.py along with checkpointed restart and
replay idempotence.

State under ``state_dir`` (the lakehouse-state pattern shared with
dedup_stream — batch-id-addressed parquet, so replays overwrite
idempotently):

- ``vecs/b{N}``    — ingested vectors (the corpus store; read back
  only for candidate verification);
- ``buckets/b{N}`` — (vec_id, table_id, bucket) LSH membership rows
  of batch N — a few rows per vector, the ONLY state the screen
  joins;
- ``hits/batch_id={N}`` — verified (vec_new, dup_of, cos9) semantic
  near-dup pairs of batch N against the PRIOR corpus.

Scale shape: per batch the screen shuffles only (table_id, bucket)
membership rows; verification reads exactly the candidate vectors
(history side fetched by semi-join from the store). compact_state
folds committed batches into one ``c{N}`` dir per relation, bounding
file count on unbounded streams (same contract as dedup_stream).

Reference: no counterpart (single-query export engine); north-star
extension at the §2.9 streaming × similarity intersection.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.semantic import SEM_THRESHOLD, _dot_raw
from .dedup_stream import _batch_dirs, _read_batches, _target_files

VEC_SCHEMA = "vec_id long, embedding array<double>"
_BUCKET_SCHEMA = "vec_id long, table_id int, bucket long"
_HIT_SCHEMA = "vec_new long, dup_of long, cos9 double"


def _normed_cols(df: DataFrame, prefix: str) -> DataFrame:
    """(id, vector, norm) with per-side column names for the pair
    join — the hoisted-norm kernel from operators/semantic."""
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with("embedding", "embedding", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return df.select(
        F.col("vec_id").alias(f"{prefix}_id"),
        F.col("embedding").alias(f"{prefix}_v"),
        nrm.alias(f"{prefix}_n"),
    )


def ingest_batch(
    spark: SparkSession, state_dir: str, delta_vecs: DataFrame, batch_id: int
) -> None:
    """Screen one arriving embedding batch against the bucket store
    and advance the state. Runs inside foreachBatch, but is an
    ordinary batch function — the tests replay it directly."""
    from ..operators.similarity import _with_table_buckets

    bid = int(batch_id)
    delta = delta_vecs.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )

    # persist the delta first (idempotent: batch-addressed) and operate
    # on the stored copy so every read sees one immutable snapshot
    vec_path = os.path.join(state_dir, "vecs", f"b{bid}")
    delta.write.mode("overwrite").parquet(vec_path)
    delta = spark.read.schema(VEC_SCHEMA).parquet(vec_path)

    delta_buckets = _with_table_buckets(delta, "embedding").select(
        "vec_id", "table_id", F.col("bucket").cast("long").alias("bucket")
    )
    bkt_path = os.path.join(state_dir, "buckets", f"b{bid}")
    delta_buckets.write.mode("overwrite").parquet(bkt_path)
    delta_buckets = spark.read.schema(_BUCKET_SCHEMA).parquet(bkt_path)

    # delta × store bucket collisions only — history never re-pairs.
    # No forced broadcast on the delta side: drop size is not a
    # constant (backfill batches exist), and delta_buckets is read
    # back from parquet so AQE sees its real size — small drops still
    # auto-broadcast at runtime, oversized ones shuffle on
    # (table_id, bucket) instead of OOMing executors.
    store = _read_batches(spark, state_dir, "buckets", bid, _BUCKET_SCHEMA)
    candidates = (
        store.alias("a")
        .join(
            delta_buckets.alias("b"),
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.vec_id").alias("dup_of"),
            F.col("b.vec_id").alias("vec_new"),
        )
        .distinct()
    )

    # exact cosine verification on candidate vectors only
    hist = _read_batches(spark, state_dir, "vecs", bid, VEC_SCHEMA)
    cand_hist = hist.join(
        candidates.select(F.col("dup_of").alias("vec_id")),
        "vec_id",
        "left_semi",
    )
    hits = (
        candidates.join(_normed_cols(cand_hist, "h"), F.col("dup_of") == F.col("h_id"))
        .join(
            # same rule: delta-sized relation, no forced broadcast —
            # parquet-backed size stats let AQE pick broadcast when
            # the drop is genuinely small
            _normed_cols(delta, "d"),
            F.col("vec_new") == F.col("d_id"),
        )
        .withColumn(
            "cos9",
            F.round(
                _dot_raw(F.col("h_v"), F.col("d_v"))
                / (F.col("h_n") * F.col("d_n")),
                9,
            ),
        )
        .filter(F.col("cos9") >= SEM_THRESHOLD)
        .select("vec_new", "dup_of", "cos9")
    )
    hits.write.mode("overwrite").parquet(
        os.path.join(state_dir, "hits", f"batch_id={bid}")
    )


def committed_through(state_dir: str) -> int | None:
    """Highest batch id that can no longer replay (the dedup-stream
    contract: everything strictly below the newest state batch)."""
    root = os.path.join(state_dir, "vecs")
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
    """Fold committed batch dirs into one ``c{through}`` per relation
    (vecs/buckets are append-unions; hits stay batch_id-partitioned
    for consumers). Crash-safe tmp+rename publish, replay-idempotent
    by construction — only no-longer-replayable batches are folded."""
    import shutil

    if through is None:
        through = committed_through(state_dir)
    if through is None:
        return

    def swap_in(merged: DataFrame, root: str) -> None:
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

    for name, schema in (("vecs", VEC_SCHEMA), ("buckets", _BUCKET_SCHEMA)):
        root = os.path.join(state_dir, name)
        dirs = _batch_dirs(state_dir, name, through + 1)
        if not dirs or dirs == [os.path.join(root, f"c{through}")]:
            continue
        swap_in(spark.read.schema(schema).parquet(*dirs), root)


def run_semantic_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    compact_every: int | None = None,
):
    """Attach the incremental semantic screen to a parquet-file
    embedding stream (one file ≈ one drop). Offsets live in the
    checkpoint, so a restart resumes exactly where the previous run
    stopped (pinned in tests)."""
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
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


def read_hits(spark: SparkSession, state_dir: str) -> DataFrame:
    """All emitted semantic near-dup hits so far, with batch ids."""
    root = os.path.join(state_dir, "hits")
    if not os.path.isdir(root):
        return spark.createDataFrame(
            [], "vec_new long, dup_of long, cos9 double, batch_id int"
        )
    return spark.read.parquet(root)
