"""Oracle-gated BOUNDED-STATE streaming deduplication (round 13):
``dropDuplicates`` over (user_id, event_type, day) as a REAL
Structured Streaming query — file source, maxFilesPerTrigger=1
micro-batches, a 25-hour watermark on the day bucket bounding the
dedup state, foreachBatch exactly-once tablelog sink, availableNow —
whose final batch-visible table is re-derived by the DuckDB oracle as
a plain DISTINCT. The third entry in the oracle-gated streaming
family (windowed_oracle.py, band_join_oracle.py), pinning the one
stateful operator they don't cover: streaming dedup.

Why the streaming result EQUALS batch DISTINCT — the eviction-safety
argument the 25-hour delay exists for:

- dedup emits a key's first occurrence IMMEDIATELY (append mode has
  no finalization wait for dropDuplicates), and the emitted row is
  the key projection itself, so the emitted SET is order-independent
  even within a micro-batch;
- state for day-bucket d evicts only once the watermark passes d,
  i.e. some already-processed row had ts > d + 25h (wm = max_seen −
  25h). The input is split into TIME-ORDERED files
  (split_time_ordered), so every row in a later file has ts at or
  above every earlier file's range — a duplicate of day d arriving
  after eviction would need ts > d + 25h > d + 24h, putting it
  outside day d: contradiction. Hence NO duplicate ever re-emits and
  the final table is exactly DISTINCT (user_id, event_type, day) —
  with state bounded to ~one day of keys instead of the unbounded
  state a bare dropDuplicates would hold. This is the
  dropDuplicates-with-watermark-column state-cleanup contract from
  the Structured Streaming guide, made exact by the time-ordered
  drop schedule.
- a replayed availableNow run against the same checkpoint must add
  NOTHING (txn-marker sink, raise-checked) — exactly-once.

The final answer read back from the tablelog is the day x event_type
distinct-user count — any re-emission (eviction bug), lost file,
double-landed batch, or day-boundary arithmetic drift surfaces as a
value-hash mismatch against the DuckDB DISTINCT.

Reference scope: the reference is a stateless row exporter
(repository/ParameterDataRepository.java:53-78); streaming dedup is
north-star surface (SURVEY §2.9 + the LLM-pipeline dedup family).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from ..sources.tablelog import append_stream_batch, latest_version
from ..sources.tablelog_source import register
from .windowed_oracle import (
    materialize_gate_result,
    run_available_now,
    scaled_stream_conf,
    split_time_ordered,
)

DEDUP_WM = "25 hours"  # > 24h day span + 1h margin: see module docstring


def stream_dedup_day_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (user_id, event_type, day) via bounded-state streaming
    dedup, aggregated to per-day per-type distinct-user counts."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    work = tempfile.mkdtemp(prefix="sddu_")
    src, ckpt, t = f"{work}/src", f"{work}/ckpt", f"{work}/t"
    os.makedirs(src)
    try:
        n_rows = split_time_ordered(ev, src)
        if not n_rows:
            return spark.createDataFrame(
                [], "day timestamp, event_type string, n_users long"
            )

        register(spark)

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            append_stream_batch(batch_df, t, app="sddu", batch_id=batch_id)

        stream = (
            spark.readStream.schema(
                "user_id long, event_type string, ts timestamp"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select(
                "user_id",
                "event_type",
                F.date_trunc("day", "ts").alias("day"),
            )
            .withWatermark("day", DEDUP_WM)
            .dropDuplicates(["user_id", "event_type", "day"])
        )

        def run() -> None:
            run_available_now(
                lambda: (
                    stream.writeStream.outputMode("append")
                    .foreachBatch(sink)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                ),
                "stream_dedup_day_users",
            )

        with scaled_stream_conf(spark, n_rows):
            run()
            lv = latest_version(t)
            run()  # replay against the same checkpoint: exactly-once
        if latest_version(t) != lv:
            raise RuntimeError(
                "stream_dedup_day_users: replayed availableNow run "
                f"added a commit (v{lv} -> v{latest_version(t)}); the "
                "txn-marker sink failed exactly-once"
            )
        out = (
            spark.read.format("tablelog")
            .option("path", t)
            .load()
            .groupBy("day", "event_type")
            # count(*), NOT count_distinct: a re-emitted tuple (state
            # eviction firing early) must SURFACE as an excess count,
            # not be silently re-deduplicated at read time
            .agg(F.count("*").cast("long").alias("n_users"))
            .orderBy("day", "event_type")
        )
        result = materialize_gate_result(
            out,
            "day timestamp, event_type string, n_users long",
            "day",
            "event_type",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return result


# The oracle is a plain DISTINCT + count — the whole point of the
# eviction-safety construction is that the streaming run must land on
# exactly this, with no threshold arithmetic at all.
STREAM_DEDUP_SQL = """
WITH dd AS (
  SELECT DISTINCT user_id, event_type, date_trunc('day', ts) AS day
  FROM events
)
SELECT day, event_type, CAST(count(*) AS BIGINT) AS n_users
FROM dd
GROUP BY day, event_type
ORDER BY day, event_type
"""

QUERIES = {"stream_dedup_day_users": stream_dedup_day_users}
ORACLES = {"stream_dedup_day_users": STREAM_DEDUP_SQL}
