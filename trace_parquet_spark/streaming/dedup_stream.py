"""Streaming incremental MinHash dedup: a document stream screened
against the accumulated corpus, batch by batch.

The streaming twin of operators/incremental_dedup.py — the shape a
100 TB corpus uses to absorb continuous crawl drops. State is three
parquet relations under ``state_dir`` (the lakehouse-state pattern
shared with streaming/pipeline.py's CDC sink — no table format
required, every write batch-id-addressed so replays are idempotent):

- ``docs/b{N}``        — ingested documents (the corpus store);
- ``sigs/b{N}``        — banded MinHash signatures of batch N's docs
  (a few dozen bytes per doc — the ONLY per-doc state the screen
  reads; signatures are immutable once written);
- ``shingle_df/b{N}``  — cumulative (shingle, df) counts AFTER batch
  N — the mergeable state behind the stopword-shingle cap
  (df > SHINGLE_DF_CAP ⇒ excluded from signatures/verification).
  Each snapshot = previous snapshot ⊕ the delta's counts: a pure
  monoid merge, so the state is replayable and crash-consistent;
- ``hits/batch_id={N}`` — the emitted (doc_new, dup_of, jaccard)
  near-dup pairs of batch N against the PRIOR corpus.

Per micro-batch (``ingest_batch``, driven by foreachBatch):

1. merge the delta's shingle-df counts into the df state; the hot
   set for this batch is the merged snapshot filtered at the cap —
   identical to batch-mode semantics when the stream drains (history
   signatures keep the cap of THEIR ingest time; the drift window is
   only shingles that cross the cap mid-stream, and a crossing
   shingle only ever removes itself from future signatures);
2. compute banded signatures for the DELTA only; band-join them
   (broadcast — the delta is the small side by construction) against
   the signature store: candidates are delta×store collisions only —
   history never re-pairs against itself, cost per batch is
   O(|delta| + collisions);
3. exact-Jaccard verify candidates, re-shingling only the CANDIDATE
   documents (history candidates fetched from the doc store);
4. append hits / signatures / docs, each into a batch-addressed
   subdirectory (idempotent under foreachBatch replay).

With a stable hot set the union of stream hits over all batches
equals batch LSH restricted to cross-batch pairs — pinned against
``dedup_minhash_lsh`` and under checkpointed restart in
tests/test_streaming_dedup.py.

Reference: no counterpart (single-query export engine); north-star
extension at the §2.9 streaming × dedup intersection.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    SHINGLE_DF_CAP,
    _band_signatures,
    _meets_threshold,
    _shingles_of,
    minhash_signatures,
)

DOC_SCHEMA = "doc_id long, text string"
_SIG_SCHEMA = "doc_id long, band_id int, band_sig string"
_DF_SCHEMA = "s string, df long"


def _batch_dirs(state_dir: str, name: str, below: int) -> list[str]:
    """State subdirectories covering batches strictly before ``below``
    (a replayed batch must not read its own partial prior write), in
    ascending batch order.

    Two dir kinds: ``b{N}`` holds batch N's delta; ``c{N}`` (written by
    ``compact_state``) holds ALL batches <= N merged. The newest ``c``
    supersedes every ``b`` at or below its id, so the result is
    [newest c (if any)] + [later b dirs]. Numeric sort throughout:
    lexicographic ordering would put b9 after b10..b19 and silently
    revert _latest_df_state's merge base to the batch-9 snapshot from
    batch 11 onward (pinned by the 12-batch test in
    tests/test_streaming_dedup.py)."""
    root = os.path.join(state_dir, name)
    if not os.path.isdir(root):
        return []
    bs, cs = [], []
    for d in os.listdir(root):
        if d[:1] in ("b", "c") and d[1:].isdigit() and int(d[1:]) < below:
            (bs if d[0] == "b" else cs).append(int(d[1:]))
    best_c = max(cs, default=None)
    out = [] if best_c is None else [os.path.join(root, f"c{best_c}")]
    out += [
        os.path.join(root, f"b{i}")
        for i in sorted(i for i in bs if best_c is None or i > best_c)
    ]
    return out


def _read_batches(
    spark: SparkSession, state_dir: str, name: str, below: int, schema: str
) -> DataFrame:
    dirs = _batch_dirs(state_dir, name, below)
    if not dirs:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*dirs)


def _latest_df_state(
    spark: SparkSession, state_dir: str, below: int
) -> DataFrame:
    """The newest cumulative shingle-df snapshot before ``below``."""
    dirs = _batch_dirs(state_dir, "shingle_df", below)
    if not dirs:
        return spark.createDataFrame([], _DF_SCHEMA)
    return spark.read.schema(_DF_SCHEMA).parquet(dirs[-1])


def committed_through(state_dir: str) -> int | None:
    """Highest batch id that can no longer replay. foreachBatch commits
    batch N's offsets before batch N+1 starts, so every batch below the
    maximum on-disk batch id is durably committed; the maximum itself
    may replay after a crash between its state write and offset commit.
    Returns None when fewer than two batches exist."""
    root = os.path.join(state_dir, "docs")
    if not os.path.isdir(root):
        return None
    ids = [
        int(d[1:])
        for d in os.listdir(root)
        if d[:1] in ("b", "c") and d[1:].isdigit()
    ]
    return max(ids) - 1 if len(ids) >= 1 and max(ids) >= 1 else None


def compact_state(
    spark: SparkSession,
    state_dir: str,
    through: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> None:
    """Merge the batch-addressed state dirs of batches <= ``through``
    into one ``c{through}`` dir per relation, bounding dir/file count
    for unbounded streams (same operational chore as
    sources/files.py:compact_parquet — per-batch writers leave
    thousands of small files whose open/footer overhead comes to
    dominate the delta×store screen).

    Replay idempotency is preserved by construction: only batches that
    can no longer replay are compacted (``through`` defaults to
    ``committed_through`` — the caller may pass something smaller,
    never larger), and readers resolve ``c{N}`` ∪ {later ``b`` dirs}
    to exactly the same rows as before. Crash-safe: the merge lands in
    a tmp dir invisible to readers, one atomic rename publishes it,
    and only then are the superseded dirs removed — a crash at any
    point leaves a readable state (at worst with an unreferenced tmp
    or stale ``b`` dirs that the next compaction sweeps).

    ``docs``/``sigs`` are append-unions, so c = merged union sized to
    ~target_file_bytes files; ``shingle_df`` snapshots are cumulative,
    so c = the newest snapshot rewritten; ``hits`` output is already
    batch_id-partitioned for consumers and is left untouched."""
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

    for name, schema in (("docs", DOC_SCHEMA), ("sigs", _SIG_SCHEMA)):
        root = os.path.join(state_dir, name)
        dirs = _batch_dirs(state_dir, name, through + 1)
        if len(dirs) <= 1 and dirs == [os.path.join(root, f"c{through}")]:
            continue  # already compacted to this point
        if not dirs:
            continue
        swap_in(spark.read.schema(schema).parquet(*dirs), root)

    df_root = os.path.join(state_dir, "shingle_df")
    df_dirs = _batch_dirs(state_dir, "shingle_df", through + 1)
    if df_dirs and df_dirs[-1] != os.path.join(df_root, f"c{through}"):
        swap_in(spark.read.schema(_DF_SCHEMA).parquet(df_dirs[-1]), df_root)


def _target_files(spark: SparkSession, root: str, target_file_bytes: int) -> int:
    """File count for the merged write, from actual on-disk bytes
    (FS metadata only — no data read), as compact_parquet does."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    return int(max(1, -(-total // target_file_bytes)))


def ingest_batch(
    spark: SparkSession, state_dir: str, delta_docs: DataFrame, batch_id: int
) -> None:
    """Screen one arriving batch against the signature store and
    advance the state. Runs inside foreachBatch, but is an ordinary
    batch function — the test replays it directly."""
    bid = int(batch_id)
    delta = delta_docs.select("doc_id", "text")

    # persist the delta docs first (idempotent: batch-addressed) and
    # operate on the stored copy so every downstream read of this
    # batch sees one immutable snapshot
    delta_path = os.path.join(state_dir, "docs", f"b{bid}")
    delta.write.mode("overwrite").parquet(delta_path)
    delta = spark.read.schema(DOC_SCHEMA).parquet(delta_path)

    delta_sh = _shingles_of(delta)

    # 1. merge df state (monoid: old ⊕ delta counts)
    old_df = _latest_df_state(spark, state_dir, bid)
    new_df = (
        old_df.unionByName(
            delta_sh.groupBy("s").agg(F.count("*").cast("long").alias("df"))
        )
        .groupBy("s")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    df_path = os.path.join(state_dir, "shingle_df", f"b{bid}")
    new_df.write.mode("overwrite").parquet(df_path)
    new_df = spark.read.schema(_DF_SCHEMA).parquet(df_path)
    hot = new_df.filter(F.col("df") > SHINGLE_DF_CAP).select("s")

    # 2. delta signatures under the current cap; band-join vs store.
    # No broadcast hint on `hot`: the over-cap shingle set grows with
    # the accumulated corpus vocabulary, not with the delta — let
    # Spark choose by measured size (it still auto-broadcasts while
    # the set is below threshold).
    delta_capped = delta_sh.join(hot, "s", "left_anti")
    delta_sigs = _band_signatures(minhash_signatures(delta_capped))
    sig_path = os.path.join(state_dir, "sigs", f"b{bid}")
    delta_sigs.write.mode("overwrite").parquet(sig_path)
    delta_sigs = spark.read.schema(_SIG_SCHEMA).parquet(sig_path)

    store_sigs = _read_batches(spark, state_dir, "sigs", bid, _SIG_SCHEMA)
    # No forced broadcast on the delta signature side: a delta scales
    # with micro-batch size, not a constant (a backfill drop of
    # millions of docs would force-broadcast a band relation past
    # executor memory). delta_sigs is read back from parquet, so AQE
    # sees its real size and still auto-broadcasts small micro-batches
    # at runtime; oversized ones fall back to a shuffle band join.
    candidates = (
        store_sigs.alias("a")
        .join(
            delta_sigs.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig")),
        )
        .select(
            F.col("a.doc_id").alias("dup_of"),
            F.col("b.doc_id").alias("doc_new"),
        )
        .distinct()
    )

    # 3. exact verification on candidate docs only. The candidate
    # id-sets scale with accumulated corpus collisions (a boilerplate-
    # heavy crawl can make them huge), so no forced broadcast on the
    # semi-joins — size/AQE decides; delta-bounded relations above
    # keep their hints.
    hist_docs = _read_batches(spark, state_dir, "docs", bid, DOC_SCHEMA)
    cand_hist = hist_docs.join(
        candidates.select(F.col("dup_of").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    cand_delta = delta.join(
        candidates.select(F.col("doc_new").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    sh_c = _shingles_of(cand_hist.unionByName(cand_delta)).join(
        hot, "s", "left_anti"
    )
    a = sh_c.alias("ca")
    b = sh_c.alias("cb")
    # candidate-pair restriction BEFORE the aggregation (and exact
    # integer threshold test, no float rounding) — mirrors the batch
    # twin in operators/dedup.py: verification work stays bounded by
    # candidate count, not candidate-doc co-pairs
    inter = (
        a.join(
            b,
            (F.col("ca.s") == F.col("cb.s"))
            & (F.col("ca.doc_id") != F.col("cb.doc_id")),
        )
        .select(
            F.col("ca.doc_id").alias("dup_of"),
            F.col("cb.doc_id").alias("doc_new"),
        )
        .join(candidates, ["dup_of", "doc_new"], "left_semi")
        .groupBy("dup_of", "doc_new")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = sh_c.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    jac = F.col("n_inter") / (F.col("sa") + F.col("sb") - F.col("n_inter"))
    hits = (
        inter.join(
            sizes.select(F.col("doc_id").alias("dup_of"), F.col("n_sh").alias("sa")),
            "dup_of",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_new"), F.col("n_sh").alias("sb")),
            "doc_new",
        )
        .filter(_meets_threshold())
        .withColumn("jaccard", F.round(jac, 6))
        .select("doc_new", "dup_of", "jaccard")
    )

    # 4. emit hits (batch-addressed — replay-idempotent)
    hits.write.mode("overwrite").parquet(
        os.path.join(state_dir, "hits", f"batch_id={bid}")
    )


def run_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    compact_every: int | None = None,
):
    """Attach the incremental screen to a parquet-file document stream
    (one file ≈ one crawl drop). Returns the started query; offsets
    live in the checkpoint, so a restart resumes exactly where the
    previous run stopped (pinned in tests). With ``compact_every`` the
    batch-addressed state is folded into one ``c`` dir per relation
    every N batches (only ever covering no-longer-replayable batches),
    so dir/file count stays bounded on unbounded streams."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
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
    """All emitted near-dup hits so far, with their batch ids."""
    root = os.path.join(state_dir, "hits")
    if not os.path.isdir(root):
        return spark.createDataFrame(
            [], "doc_new long, dup_of long, jaccard double, batch_id int"
        )
    return spark.read.parquet(root)
