"""Partitioned-dataset behaviors that only matter at scale: static
partition pruning, dynamic partition pruning (DPP), raw-binary
ingestion, and schema-evolution reads.

On 100 TB these are the difference between scanning a directory and
scanning a fleet: hive-style partition dirs prune at PLANNING time for
literal predicates, and at RUNTIME (DPP) for join-derived predicates.
The assertions pin the plan shapes so a regression (e.g. a cast that
defeats pruning) fails loudly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.sources.files import (
    read_binary_dir,
    read_parquet_merged_schema,
)
from trace_parquet_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def part_orders(spark, sf_dir, tmp_path_factory):
    """Orders written hive-partitioned by priority (5 partitions)."""
    path = str(tmp_path_factory.mktemp("part") / "orders_by_priority")
    (
        load_table(spark, sf_dir, "orders")
        .withColumn("prio", F.split("o_orderpriority", "-").getItem(0))
        .write.mode("overwrite")
        .partitionBy("prio")
        .parquet(path)
    )
    return path


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_static_partition_pruning(spark, part_orders):
    df = spark.read.parquet(part_orders).filter(F.col("prio") == "1")
    plan = _plan(df)
    assert "PartitionFilters: [" in plan and "prio" in plan
    # the partition predicate must NOT appear as a data filter
    assert "PushedFilters: []" in plan
    got = df.select("o_orderpriority").distinct().collect()
    assert {r[0] for r in got} == {"1-URGENT"}


def test_dynamic_partition_pruning_on_join(spark, part_orders):
    """A filter on the dim side must prune fact partitions at runtime:
    the fact scan carries a dynamicpruning subquery on `prio`."""
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    fact = spark.read.parquet(part_orders)
    dim = spark.createDataFrame(
        [("1", "urgent"), ("2", "high"), ("3", "medium"), ("4", "low"), ("5", "none")],
        "prio_key string, label string",
    ).filter(F.col("label") == "urgent")
    joined = fact.join(dim, fact.prio == dim.prio_key).groupBy("label").agg(
        F.count("*").alias("n")
    )
    optimized = joined._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "dynamicpruning" in optimized
    rows = joined.collect()
    assert len(rows) == 1 and rows[0].label == "urgent" and rows[0].n > 0


def test_binary_file_source_roundtrip(spark, tmp_path):
    """binaryFile source: bytes land intact, glob filters apply, and
    the rows feed the multimodal featurizer unchanged."""
    payloads = {
        "a.img": b"\x89PNGfakeimagebytes\x00\x01",
        "b.img": b"RIFFfakeaudio\x02",
        "skip.txt": b"not media",
    }
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    df = read_binary_dir(spark, str(tmp_path), glob="*.img")
    rows = {os.path.basename(r.path): r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}
    for name, r in rows.items():
        assert bytes(r.content) == payloads[name]
        assert r.length == len(payloads[name])

    from trace_parquet_spark.operators.multimodal import fake_decode_features

    feats = fake_decode_features(
        df.select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("content").alias("payload"),
        )
    ).collect()
    by_len = {r.byte_len: r for r in feats}
    assert by_len[len(payloads["a.img"])].first_byte == 0x89


def test_merge_schema_evolution(spark, tmp_path):
    """Old files (v1: no `score`) and new files (v2: adds `score`)
    read as one dataset: union schema, NULL score for v1 rows."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string").write.parquet(
        base + "/batch=1"
    )
    spark.createDataFrame(
        [(3, "c", 0.5)], "id long, name string, score double"
    ).write.parquet(base + "/batch=2")

    merged = read_parquet_merged_schema(spark, base)
    assert {f.name for f in merged.schema} >= {"id", "name", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[3].score == 0.5

    # default (first-footer) read would have missed `score` for v1-only
    # ordering; prove mergeSchema was the thing that unioned it
    plain = spark.read.parquet(base + "/batch=1")
    assert "score" not in plain.columns


def test_zone_map_prunes_files_and_preserves_results(spark, sf_dir, tmp_path):
    """Range-partitioned sorted layout + footer-stats zone map: a
    narrow predicate must scan a strict subset of files and return
    exactly the full-scan result."""
    from trace_parquet_spark.sources.files import write_partitioned_sorted
    from trace_parquet_spark.sources.zonemap import build_zone_map, pruned_read

    path = str(tmp_path / "orders_sorted")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned_sorted(orders, path, ["o_totalprice"], num_partitions=8)

    zm = build_zone_map(path, "o_totalprice")
    assert sum(z["rows"] for z in zm) == orders.count()
    assert all(z["min"] is not None for z in zm)

    lo, hi = 50000.0, 80000.0
    df, scanned, total = pruned_read(spark, zm, lo, hi)
    assert scanned < total  # pruning actually happened
    got = df.filter(F.col("o_totalprice").between(lo, hi))
    full = orders.filter(F.col("o_totalprice").between(lo, hi))
    assert got.count() == full.count()
    assert got.exceptAll(full).count() == 0
