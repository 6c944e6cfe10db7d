"""Oracle-gated stream-stream time-band LEFT OUTER join (round-13,
VERDICT task 3): pipeline.py's ``click_purchase_stream_join`` —
purchases matched to a prior click by the same user within a 1-hour
horizon, unmatched purchases emitted NULL-padded once the watermark
proves no future click can match — run as a REAL Structured Streaming
query (file source, maxFilesPerTrigger=1, foreachBatch exactly-once
tablelog sink, availableNow) whose final batch-visible table is
re-derived by the DuckDB oracle from the same input rows.

Determinism argument, extending the windowed oracle's
(windowed_oracle.py module docstring):

- the input slice (click+purchase events) is split into N_FILES
  TIME-ORDERED files, so no row ever arrives late and NO TRUE MATCH is
  ever lost to state eviction: a click is evicted only when the global
  watermark passes click_ts + horizon, and every purchase in a later
  file has purchase_ts above the previous files' max — if it could
  band-match the evicted click (purchase_ts ≤ click_ts + horizon < WM
  ≤ prev_max < purchase_ts) we get a contradiction. Hence the MATCHED
  set is exactly the batch-side band join — SQL-expressible.
- the NULL-PADDED set is the deterministic finalization frontier:
  a never-matched purchase is emitted with null click columns in the
  micro-batch where the purchase falls below the LEFT state watermark.
  From the band condition (click_ts ≤ purchase_ts), a purchase can
  still match a future click iff purchase_ts ≥ WM, so the left state
  watermark equals the global event-time watermark. availableNow runs
  a final flush batch after the last file advances the watermark
  (measured, same machinery as the windowed oracle), so the emitted
  null-padded set is exactly { unmatched purchase :
  purchase_us // 1000 < final_wm_ms } — CALIBRATED at sf0.001/0.01
  against the live run (strict <, ms grain; Spark tracks event-time
  stats in ms and StreamingSymmetricHashJoinExec evicts strictly
  below the state watermark). Unmatched purchases of the trailing
  watermark-delay hour stay in state: the deterministic drop set.
- the global watermark with TWO watermark operators (one per side)
  is their MINIMUM (spark.sql.streaming.multipleWatermarkPolicy=min,
  the default): final_wm_ms = min(max click_us, max purchase_us)
  // 1000 − WM_DELAY_MS — mirrored exactly in the oracle SQL.
- a replayed availableNow run against the same checkpoint must add
  NOTHING (txn-marker sink, raise-checked) — exactly-once.

A double-landed batch, a lost match, a premature or missed
finalization, or a watermark off-by-one all surface as a value-hash
mismatch against the oracle.

Reference scope: the reference is a stateless row exporter
(repository/ParameterDataRepository.java:53-78); stream-stream joins
are north-star surface (SURVEY §2.9).
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
from .pipeline import click_purchase_stream_join
from .windowed_oracle import (
    materialize_gate_result,
    run_available_now,
    scaled_stream_conf,
    split_time_ordered,
)

WM_DELAY_MS = 3_600_000   # 1 hour watermark delay (both sides)
HORIZON_MS = 3_600_000    # 1 hour click->purchase attribution band

_OUT_SCHEMA = (
    "user_id long, purchase_id long, purchase_ts timestamp, "
    "click_id long, click_ts timestamp, purchase_value double"
)


def stream_band_join_finalize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Final tablelog contents of the watermarked stream-stream
    left-outer band join over the click/purchase events slice (see
    module docstring for the determinism argument)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        # parquet µs timestamps load as TIMESTAMP_NTZ; the session TZ
        # is pinned UTC, so the LTZ cast is value-preserving
        .select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
    )
    work = tempfile.mkdtemp(prefix="sbjf_")
    src, ckpt, t = f"{work}/src", f"{work}/ckpt", f"{work}/t"
    os.makedirs(src)
    try:
        n_rows = split_time_ordered(ev, src)
        if not n_rows:
            return spark.createDataFrame([], _OUT_SCHEMA)

        register(spark)

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            append_stream_batch(batch_df, t, app="sbjf", batch_id=batch_id)

        stream_src = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        joined = click_purchase_stream_join(
            stream_src.filter(F.col("event_type") == "click"),
            stream_src.filter(F.col("event_type") == "purchase"),
            horizon="1 hour",
            watermark="1 hour",
            how="left_outer",
        )

        def run() -> None:
            run_available_now(
                lambda: (
                    joined.writeStream.outputMode("append")
                    .foreachBatch(sink)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                ),
                "stream_band_join_finalize",
            )

        with scaled_stream_conf(spark, n_rows):
            run()
            lv = latest_version(t)
            run()  # replay against the same checkpoint: exactly-once
        if latest_version(t) != lv:
            # explicit raise, not assert: must survive `python -O`
            raise RuntimeError(
                "stream_band_join_finalize: replayed availableNow run "
                f"added a commit (v{lv} -> v{latest_version(t)}); the "
                "txn-marker sink failed exactly-once"
            )
        out = (
            spark.read.format("tablelog")
            .option("path", t)
            .load()
            .orderBy("purchase_id", "click_id")
        )
        result = materialize_gate_result(
            out, _OUT_SCHEMA, "purchase_id", "click_id"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return result


# Watermark arithmetic mirrored exactly: Spark's event-time stats are
# millisecond-grain per watermark operator; with two operators the
# global watermark is their min (multipleWatermarkPolicy=min default).
# Matched pairs emit unconditionally (no-late-data construction above);
# null-padded purchases emit iff strictly below the final watermark.
#
# GRAIN: the session pins parquet output to TIMESTAMP_MILLIS (the
# reference's record-encode contract, SURVEY §2 S4 / session.py), so
# the time-ordered split files — and therefore every event time the
# streaming query sees, joins on, and sinks — are ms-truncated. The
# oracle models the entire computation at ms grain (ms = µs // 1000):
# band comparisons, watermark threshold, and emitted timestamps.
STREAM_BAND_JOIN_SQL = f"""
WITH ev AS (
  SELECT event_id, epoch_us(ts) // 1000 AS ms, user_id, event_type, value
  FROM events WHERE event_type IN ('click', 'purchase')
),
c AS (SELECT * FROM ev WHERE event_type = 'click'),
p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
thr AS (
  SELECT least((SELECT max(ms) FROM c),
               (SELECT max(ms) FROM p))
         - {WM_DELAY_MS} AS wm_ms
),
matched AS (
  SELECT p.user_id,
         p.event_id AS purchase_id,
         make_timestamp(p.ms * 1000) AS purchase_ts,
         c.event_id AS click_id,
         make_timestamp(c.ms * 1000) AS click_ts,
         p.value AS purchase_value
  FROM p JOIN c
    ON p.user_id = c.user_id
   AND c.ms <= p.ms
   AND c.ms >= p.ms - {HORIZON_MS}
),
finalized AS (
  SELECT p.user_id,
         p.event_id AS purchase_id,
         make_timestamp(p.ms * 1000) AS purchase_ts,
         CAST(NULL AS BIGINT) AS click_id,
         CAST(NULL AS TIMESTAMP) AS click_ts,
         p.value AS purchase_value
  FROM p, thr
  WHERE p.ms < thr.wm_ms
    AND NOT EXISTS (
      SELECT 1 FROM c
      WHERE c.user_id = p.user_id
        AND c.ms <= p.ms
        AND c.ms >= p.ms - {HORIZON_MS}
    )
)
SELECT * FROM matched
UNION ALL
SELECT * FROM finalized
ORDER BY purchase_id, click_id
"""

QUERIES = {"stream_band_join_finalize": stream_band_join_finalize}
ORACLES = {"stream_band_join_finalize": STREAM_BAND_JOIN_SQL}
