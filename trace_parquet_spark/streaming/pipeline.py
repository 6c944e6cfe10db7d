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
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
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
) -> DataFrame:
    """Stream-stream inner join: purchases matched to a prior click by
    the same user within ``horizon``. Both sides carry watermarks and
    the join condition carries the time band — that pair is what lets
    Spark expire buffered rows (state is bounded by watermark +
    horizon; an unbounded stream-stream join would buffer forever).
    The streaming twin of operators/asof.py's batch as-of join.
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
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        "purchase_value",
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
