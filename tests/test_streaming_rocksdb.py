"""RocksDB state store: the stateful-streaming configuration that
matters at scale. The default HDFSBackedStateStoreProvider keeps every
key's state on the executor HEAP — a watermarked aggregation over
billions of keys OOMs. RocksDBStateStoreProvider (built into Spark 4,
no extra jars) spills state to local disk with changelog checkpointing.

These tests run a real stateful query (windowed counts) under the
RocksDB provider, assert results are identical to batch, and prove
state survives a checkpointed restart — i.e. the provider is actually
wired in, not silently ignored (verified via the state-store dir
layout RocksDB creates)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.sources.registry import load_table
from trace_parquet_spark.streaming.pipeline import (
    read_events_stream,
    windowed_counts,
)

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _run_windowed(spark, src, ckpt, out_name):
    q = (
        windowed_counts(read_events_stream(spark, src, max_files_per_trigger=4))
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {out_name}")


def test_rocksdb_provider_matches_batch_and_restarts(spark, sf_dir, tmp_path):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        ev = load_table(spark, sf_dir, "events").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        half_a = ev.filter(F.col("event_id") % 2 == 0)
        half_b = ev.filter(F.col("event_id") % 2 == 1)
        half_a.repartition(2).write.mode("overwrite").parquet(src)

        got1 = _run_windowed(spark, src, ckpt, "rocksdb_run1")
        batch1 = (
            half_a.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            ).agg(F.count("*").alias("n"))
        )
        assert got1.count() == batch1.count()

        # RocksDB provider lays out state as <ckpt>/state/0/<part>/ with
        # .zip snapshots + .changelog files — prove it's really RocksDB,
        # not the HDFS-backed default (.delta files)
        state_root = os.path.join(ckpt, "state", "0")
        files = []
        for root, _dirs, names in os.walk(state_root):
            files += names
        assert any(n.endswith((".zip", ".changelog")) for n in files), files
        assert not any(n.endswith(".delta") for n in files)

        # restart from the same checkpoint with the other half appended:
        # counts must equal the full batch aggregation (state recovered)
        half_b.repartition(2).write.mode("append").parquet(src)
        got2 = _run_windowed(spark, src, ckpt, "rocksdb_run2")
        full = (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("w.start").alias("ws"), "event_type", F.col("n")
            )
        )
        got2n = got2.select(
            F.col("window_start").alias("ws"), "event_type", F.col("n_events").alias("n")
        )
        assert got2n.exceptAll(full).count() == 0
        assert full.exceptAll(got2n).count() == 0
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def _has_protobuf() -> bool:
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas spawns a protobuf-speaking Python "
    "driver worker; google.protobuf is not installed in this image",
)
def test_transform_with_state_running_totals(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-state API, typed
    ValueState, RocksDB-only): per-user running totals must equal the
    batch aggregation after the stream drains."""
    from trace_parquet_spark.streaming.pipeline import (
        read_events_stream,
        tws_user_totals,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        src = str(tmp_path / "src")
        ev = load_table(spark, sf_dir, "events").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        ev.repartition(4).write.mode("overwrite").parquet(src)
        stream = tws_user_totals(
            read_events_stream(spark, src, max_files_per_trigger=2)
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("tws_tot")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # update mode: the row with the max n_events per user is final
        got = {
            r.user_id: (r.n_events, r.total_value)
            for r in spark.sql(
                """SELECT user_id, n_events, total_value FROM (
                     SELECT *, row_number() OVER (PARTITION BY user_id
                                ORDER BY n_events DESC) rn FROM tws_tot)
                   WHERE rn = 1"""
            ).collect()
        }
        batch = {
            r.user_id: (r.n, r.tv)
            for r in ev.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("tv"),
            )
            .collect()
        }
        assert set(got) == set(batch)
        for uid, (n, tv) in batch.items():
            assert got[uid][0] == n
            assert abs(got[uid][1] - tv) < 0.05  # float accumulation order
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
