"""Scale-path mechanisms: salting correctness, bucketed joins being
Exchange-free, and the range-partitioned sorted sink (tested in
test_sources)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.operators.skew import salted_agg, salted_join
from trace_parquet_spark.sources.bucketing import bucketed_join, write_bucketed
from trace_parquet_spark.sources.registry import load_table


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: (r.n, round(r.qty, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    salted = salted_agg(
        li,
        "l_returnflag",
        aggs=[
            F.sum("n").alias("n"),
            F.sum("qty").alias("qty"),
        ],
        partial_aggs=[
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("qty"),
        ],
        buckets=8,
    )
    got = {r.l_returnflag: (r.n, round(r.qty, 2)) for r in salted.collect()}
    assert got == plain


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cust = cust.withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, "o_custkey").count()
    salted = salted_join(orders, cust, "o_custkey", buckets=4).count()
    assert salted == plain


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
        write_bucketed(li, "b_lineitem", ["o_orderkey"], 8, ["o_orderkey"])
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        # sanity: result matches the plain join
        assert joined.count() == load_table(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
