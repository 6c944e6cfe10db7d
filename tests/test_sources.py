"""File-format source/sink round-trips (SURVEY §2.1 S8) and the
scale-path ordered writer."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.sources.files import (
    read_table,
    write_partitioned_sorted,
    write_single_parquet_file,
    write_table,
)
from trace_parquet_spark.sources.kafka import KafkaUnavailableError, read_stream
from trace_parquet_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "parquet"])
def test_roundtrip_formats(spark, nation, tmp_path, fmt):
    path = str(tmp_path / f"nation_{fmt}")
    write_table(nation, fmt, path)
    schema = "n_nationkey int, n_name string, n_regionkey int" if fmt in ("csv", "json") else None
    back = read_table(spark, fmt, path, schema=schema)
    assert back.count() == nation.count()
    assert {r.n_name for r in back.collect()} == {r.n_name for r in nation.collect()}


def test_partition_by_column(spark, nation, tmp_path):
    path = str(tmp_path / "nation_part")
    write_table(nation, "parquet", path, partition_by=["n_regionkey"])
    back = spark.read.parquet(path)
    assert back.count() == nation.count()
    # partition pruning: filter on the partition col reads 1 dir
    pruned = back.filter(F.col("n_regionkey") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_single_file_sink(spark, nation, tmp_path):
    path = str(tmp_path / "single")
    write_single_parquet_file(nation.orderBy("n_nationkey"), path)
    files = [f for f in __import__("os").listdir(path) if f.endswith(".parquet")]
    assert len(files) == 1


def test_partitioned_sorted_sink(spark, sf_dir, tmp_path):
    path = str(tmp_path / "sorted")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned_sorted(orders, path, ["o_orderkey"], num_partitions=4)
    # each file is internally sorted and files are range-disjoint
    import os

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    ranges = []
    for f in files:
        col = pq.read_table(f, columns=["o_orderkey"]).column(0).to_pylist()
        assert col == sorted(col)
        if col:
            ranges.append((col[0], col[-1]))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo


def test_kafka_gated(spark):
    with pytest.raises(KafkaUnavailableError):
        read_stream(spark, "localhost:9092", "trace")


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from trace_parquet_spark.sources.files import compact_parquet

    src = str(tmp_path / "fragmented")
    # 40 tiny files
    spark.range(0, 4000).repartition(40).write.mode("overwrite").parquet(src)
    import glob as _glob

    assert len(_glob.glob(src + "/part-*.parquet")) == 40

    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, out, target_file_bytes=10**9)
    assert n == 1
    assert len(_glob.glob(out + "/part-*.parquet")) == 1
    # content preserved
    assert spark.read.parquet(out).count() == 4000
    got = spark.read.parquet(out).agg({"id": "sum"}).collect()[0][0]
    assert got == sum(range(4000))


def test_python_datasource_gzjsonl(spark, tmp_path):
    """Custom Python DataSource (Spark 4): per-file partitions, rows
    intact through gzip+JSON decode, and EqualTo pushdown applied
    inside the reader."""
    import gzip
    import json

    from pyspark.sql import functions as F

    from trace_parquet_spark.sources.pydatasource import register

    rows = []
    for fidx in range(3):
        path = tmp_path / f"part{fidx}.jsonl.gz"
        with gzip.open(path, "wt", encoding="utf-8") as fh:
            for i in range(40):
                rec = {
                    "trace_id": fidx * 1000 + i,
                    "param_index": i % 4,
                    "payload": f"p{fidx}:{i}",
                }
                rows.append(rec)
                fh.write(json.dumps(rec) + "\n")
    (tmp_path / "ignored.txt").write_text("not a shard")

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register(spark)
    df = spark.read.format("gzjsonl").option("path", str(tmp_path)).load()
    assert df.rdd.getNumPartitions() == 3  # one per shard file
    got = {r.trace_id: r for r in df.collect()}
    assert len(got) == len(rows)
    for rec in rows:
        r = got[rec["trace_id"]]
        assert (r.param_index, r.payload) == (rec["param_index"], rec["payload"])

    # pushdown: plan carries the filter into the Python scan and the
    # result set is exact
    one = df.filter(F.col("param_index") == 2)
    assert one.count() == sum(1 for r in rows if r["param_index"] == 2)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan gzjsonl" in plan
    # the EqualTo was CONSUMED by the reader: the only residual
    # post-scan filter is the null check, not the equality
    assert "= 2" not in plan


def test_python_datasource_streaming(spark, tmp_path):
    """Streaming side of the custom connector: files arriving between
    micro-batches are delivered exactly once via the offset contract."""
    import gzip
    import json

    from trace_parquet_spark.sources.pydatasource import register

    def shard(fidx, n):
        path = tmp_path / f"s{fidx}.jsonl.gz"
        with gzip.open(path, "wt", encoding="utf-8") as fh:
            for i in range(n):
                fh.write(
                    json.dumps(
                        {
                            "trace_id": fidx * 100 + i,
                            "param_index": i % 3,
                            "payload": f"s{fidx}:{i}",
                        }
                    )
                    + "\n"
                )

    register(spark)
    shard(0, 10)
    stream = (
        spark.readStream.format("gzjsonl").option("path", str(tmp_path)).load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("gz_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) c FROM gz_stream").first().c == 10
        shard(1, 7)  # a new shard lands mid-stream
        q.processAllAvailable()
        rows = spark.sql("SELECT trace_id FROM gz_stream").collect()
    finally:
        q.stop()
    ids = sorted(r.trace_id for r in rows)
    assert ids == sorted(list(range(10)) + [100 + i for i in range(7)])


def test_python_datasource_write_roundtrip(spark, tmp_path):
    """Writer side: DataFrame -> custom sink -> custom source, bytes
    and rows intact; overwrite mode replaces prior shards."""
    from trace_parquet_spark.sources.pydatasource import register

    register(spark)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(i, i % 5, f"payload-{i}") for i in range(200)],
        "trace_id bigint, param_index int, payload string",
    ).repartition(4)
    df.write.format("gzjsonl").option("path", out).mode("append").save()

    back = spark.read.format("gzjsonl").option("path", out).load()
    assert back.count() == 200
    assert back.rdd.getNumPartitions() == 4  # one shard per writer task
    assert {r.payload for r in back.collect()} == {
        f"payload-{i}" for i in range(200)
    }

    # overwrite replaces, not appends
    df.limit(10).repartition(1).write.format("gzjsonl").option(
        "path", out
    ).mode("overwrite").save()
    assert (
        spark.read.format("gzjsonl").option("path", out).load().count() == 10
    )


def test_gzjsonl_pushfilters_conjunction_intersects():
    # EqualTo AND In on param_index in one conjunction: both filters
    # are consumed, so both must constrain the scan (intersection) —
    # overwriting with the last one would return rows the first
    # filter excludes, and Spark never re-applies consumed filters.
    from pyspark.sql.datasource import EqualTo, In

    from trace_parquet_spark.sources.pydatasource import GzJsonlReader

    r = GzJsonlReader({"path": "/nonexistent-ok-for-unit"})
    leftover = list(
        r.pushFilters(
            [In(("param_index",), (1, 2, 3)), EqualTo(("param_index",), 2)]
        )
    )
    assert leftover == []
    assert r.allowed_params == {2}
