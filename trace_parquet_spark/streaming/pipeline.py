"""Structured Streaming pipelines over the events stream.

The reference's "reactive" layer is concurrency plumbing, not stream
semantics (SURVEY §2.9) — every request is a bounded batch. This
module supplies the real streaming surface the north star asks for:
file-source ``readStream`` (stand-in for Kafka; see sources/kafka.py),
event-time watermarks, tumbling/session windows, and an
``applyInPandasWithState`` custom stateful operator. The batch twins
in ``operators/time_rollup.py`` share the same window logic, so the
DuckDB oracle checks of those batch queries also pin these semantics.

At scale: state stores partition by group key; watermark bounds state
size; ``foreachBatch`` gives exactly-once parquet sinks.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import money_sum
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream (one file per micro-batch by default)."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width), "event_type")
        .agg(F.count("*").alias("n_events"), money_sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows per user with watermarked state expiry."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


RUNNING_STATE_SCHEMA = "user_id long, n_events long, total_value double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals via
    applyInPandasWithState (the Spark shape for reference-style
    per-key incremental processing)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_STATE_SCHEMA,
        stateStructType="n_events long, total_value double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def tws_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas — the
    Spark 4 arbitrary-state API that supersedes applyInPandasWithState
    (typed state handles: ValueState/ListState/MapState, timers, TTL,
    and it REQUIRES the RocksDB state store provider, i.e. disk-backed
    state from day one).

    Output contract matches running_user_totals above: one updated
    (user_id, n_events, total_value) row per key per micro-batch.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql import types as T

    state_schema = T.StructType(
        [
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_STATE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def dedup_events_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exactly-once-per-key dedup: drop re-deliveries of the
    same event_id arriving within the watermark horizon
    (dropDuplicatesWithinWatermark — state for a key expires once the
    watermark passes it, so state size is bounded by the late-data
    window, not by stream history; plain dropDuplicates on a stream
    would keep every key forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def click_purchase_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: purchases matched to a prior click by
    the same user within ``horizon``. Both sides carry watermarks and
    the join condition carries the time band — that pair is what lets
    Spark expire buffered rows (state is bounded by watermark +
    horizon; an unbounded stream-stream join would buffer forever).
    The streaming twin of operators/asof.py's batch as-of join.

    ``how="left_outer"`` adds the OUTER semantics only a watermark
    makes possible on streams: an unmatched purchase is emitted
    null-padded once the watermark proves no future click can still
    match it (before that point "no match yet" is indistinguishable
    from "match still in flight") — the conversion-failure feed a
    marketing pipeline actually wants, and the state-eviction corner
    the inner join never exercises.

    ``how="full_outer"`` (Spark 3.1+) finalizes BOTH sides: unmatched
    purchases null-padded on the click columns AND unmatched clicks
    null-padded on the purchase columns, each emitted only at its
    watermark close — the shape a training-data join of two
    late-arriving event feeds needs (neither feed's unmatched rows
    may be dropped). ``user_id`` is coalesced across sides so it is
    never null whichever side survives alone.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
        ),
        how,
    ).select(
        # full_outer emits click-only rows where p_user is null
        F.coalesce(F.col("p_user"), F.col("c_user")).alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        "purchase_value",
    )


def attributed_revenue_windows(
    clicks: DataFrame,
    purchases: DataFrame,
    width: str = "1 hour",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """CHAINED stateful operators in ONE streaming query — the Spark-4
    multiple-stateful-operator shape (SPARK-42376): stream-stream
    time-band join (purchases attributed to a prior click, state
    bounded by watermark + horizon) feeding an event-time tumbling
    window aggregation on the JOIN OUTPUT, in append mode.

    Before multi-stateful support this required two queries with an
    intermediate sink; now the join's output watermark (tracked
    through purchase_ts) drives the downstream window's finalization
    directly: a window emits once the watermark proves no further
    join result can land in it. Output: per-window attributed
    conversion count and revenue — the real-time marketing rollup.

    At scale both stateful operators partition by their own keys
    (join on user, window agg on window start); state stores stay
    independent and watermark-bounded.
    """
    joined = click_purchase_stream_join(
        clicks, purchases, horizon, watermark, "inner"
    )
    return (
        joined.groupBy(F.window("purchase_ts", width))
        .agg(
            F.count("*").alias("n_attributed"),
            # exact BIGINT-cents summation (functions/money.py
            # discipline): round(sum(double),2) is order-dependent
            # across micro-batch partial aggregations
            (
                F.sum(
                    F.round(F.col("purchase_value") * 100).cast("long")
                )
                / F.lit(100.0)
            ).alias("revenue"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_attributed",
            "revenue",
        )
    )


def enriched_windowed_counts(
    events: DataFrame,
    dim: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STATIC dimension enrichment feeding a windowed rollup —
    the standard production enrichment shape (join each event to a
    slowly-changing dimension snapshot, aggregate by its attribute):
    the static side is broadcast per micro-batch (stateless — no join
    buffers, unlike a stream-stream join), so only the downstream
    window aggregation carries state, bounded by the watermark.

    ``dim`` is a static DataFrame (user_id, segment). Events with no
    dimension row fall into segment 'unknown' (left join — an
    enrichment must not drop facts)."""
    e = events.withWatermark("ts", watermark)
    d = F.broadcast(
        dim.select(
            F.col("user_id").alias("d_user"), F.col("segment").alias("segment")
        )
    )
    return (
        e.join(d, e.user_id == d.d_user, "left")
        .withColumn("segment", F.coalesce("segment", F.lit("unknown")))
        .groupBy(F.window("ts", width), "segment")
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "segment",
            "n_events",
            "total_value",
        )
    )


def write_stream_exactly_once(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Exactly-once parquet sink via foreachBatch: each micro-batch
    writes to a batch-id-addressed subdirectory, so a replayed batch
    (after failure/restart) overwrites its own output instead of
    duplicating — idempotent by construction. The checkpoint dir
    carries source offsets; restarting with the same checkpoint resumes
    where the previous run stopped."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


def write_stream_cdc_upsert(
    changes: DataFrame, state_dir: str, checkpoint_dir: str
):
    """Streaming CDC apply: each micro-batch of keyed changes
    (user_id, ts, event_id, value, op ∈ {U, D}) is MERGEd into a
    versioned parquet state table inside foreachBatch — the lakehouse
    upsert-sink pattern without a table format. Per batch:

    1. reduce the batch to its latest change per key (micro-batches
       can carry several changes for one key);
    2. union with the current state and keep each key's HIGHEST-VERSION
       change — merge is by version (ts, event_id), never by arrival
       order, because micro-batches arrive in FILE order: the stored
       state keeps tombstones so a delete outranks older out-of-order
       upserts arriving after it (Kafka-compaction semantics;
       production would expire tombstones past the lateness horizon);
    3. write state version v{batch_id} and repoint the _LATEST marker
       — never overwriting the version being read, so a crash between
       write and repoint leaves the previous state intact (foreachBatch
       re-delivers the batch on restart: same batch_id, same result —
       idempotent).

    Scale: state shuffles once on the key per batch, exactly Delta's
    MERGE shape; the version marker stands in for a transaction log.
    """
    import os

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        latest = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        cur = _read_cdc_versions(spark, state_dir)
        merged = latest if cur is None else cur.unionByName(latest)
        merged = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        vdir = os.path.join(state_dir, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(vdir)
        marker = os.path.join(state_dir, "_LATEST.tmp")
        with open(marker, "w") as f:
            f.write(f"v{batch_id}")
        os.replace(marker, os.path.join(state_dir, "_LATEST"))

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def _read_cdc_versions(spark: SparkSession, state_dir: str):
    """Raw current state (tombstones included) per _LATEST, or None."""
    import os

    marker = os.path.join(state_dir, "_LATEST")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(state_dir, version))


def read_cdc_state(spark: SparkSession, state_dir: str):
    """The table view of the CDC state: live rows only (tombstones
    filtered), op column dropped. None before the first batch."""
    raw = _read_cdc_versions(spark, state_dir)
    if raw is None:
        return None
    return raw.filter(F.col("op") != "D").drop("op")


def vacuum_cdc_state(state_dir: str, keep: int = 2) -> list[str]:
    """Retention cleanup for the versioned CDC state: delete all but
    the newest ``keep`` version dirs, never touching the version the
    _LATEST marker points at. Returns the deleted version names.

    The lakehouse VACUUM chore: every foreachBatch commit leaves a full
    prior version behind for crash safety; without retention the state
    dir grows linearly with batch count.
    """
    import os
    import shutil

    marker = os.path.join(state_dir, "_LATEST")
    current = None
    if os.path.exists(marker):
        with open(marker) as f:
            current = f.read().strip()
    versions = sorted(
        (d for d in os.listdir(state_dir) if d.startswith("v")),
        key=lambda d: int(d[1:]),
    )
    doomed = [v for v in versions[:-keep] if v != current] if keep else []
    for v in doomed:
        shutil.rmtree(os.path.join(state_dir, v))
    return doomed


def run_to_memory_sink(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a bounded file-backed stream to completion synchronously
    (test/smoke harness) and return the sink contents."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
