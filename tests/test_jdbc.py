"""JDBC source/sink round-trip against embedded Derby (bundled with
Spark) — the reference's actual input path (SURVEY §2.1 S1): write the
trace table to a real database, read it back with predicate pushdown,
and run the faithful export off the JDBC scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.operators.trace_export import (
    export_trace,
    make_trace_fixture,
)
from trace_parquet_spark.sources.jdbc import project_trace_param, read_jdbc


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "tracedb"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def seeded(spark, derby_url):
    """Seed TD_FD_TRACE_PARAM like the reference's DataInitializer."""
    df = make_trace_fixture(spark).select(
        F.col("paramIndex").alias("PARAM_INDEX"),
        F.col("startTime").alias("START_TIME"),
        F.col("endTime").alias("END_TIME"),
        F.col("traceData").alias("TRACE_DATA"),
    )
    (
        df.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "TD_FD_TRACE_PARAM")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .mode("overwrite")
        .save()
    )
    return derby_url


def test_jdbc_roundtrip_and_export(spark, seeded):
    raw = read_jdbc(
        spark,
        seeded,
        "TD_FD_TRACE_PARAM",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    trace = project_trace_param(raw)
    assert trace.count() == 3
    rows = export_trace(
        trace, [1, 2], "2024-01-01T00:00:00", "2024-12-31T00:00:00"
    ).collect()
    assert [r.paramIndex for r in rows] == [1, 2]
    assert rows[0].traceData == '{"value": 100, "status": "OK"}'


def test_jdbc_partitioned_read(spark, seeded):
    """Range-partitioned parallel scan — the 100 TB ingest shape."""
    df = read_jdbc(
        spark,
        seeded,
        "TD_FD_TRACE_PARAM",
        partition_column="PARAM_INDEX",
        lower_bound=1,
        upper_bound=4,
        num_partitions=3,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 3


def test_jdbc_predicate_pushdown(spark, seeded):
    raw = read_jdbc(
        spark,
        seeded,
        "TD_FD_TRACE_PARAM",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    filtered = raw.filter(F.col("PARAM_INDEX") == 2)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "PARAM_INDEX" in plan
    assert filtered.count() == 1
