"""Round-4 additions: integer PageRank, the explicit Bloom-style
prefilter join, TPC-DS-shaped rollup-rank / channel-union queries, and
the time-to-convert funnel percentiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from trace_parquet_spark.plans.ds_shapes import (
    TOPK,
    channel_union_rollup,
    rollup_rank_mfgr_brand,
)
from trace_parquet_spark.plans.funnels import time_to_convert
from trace_parquet_spark.plans.graph_rank import (
    ITERS,
    SCALE,
    pagerank_trade_graph,
)
from trace_parquet_spark.plans.join_strategies import bloom_prefilter_join
from trace_parquet_spark.sources.registry import load_table


def test_pagerank_mass_conserved_and_positive(spark, sf_dir):
    rows = pagerank_trade_graph(spark, sf_dir).collect()
    nation_n = load_table(spark, sf_dir, "nation").count()
    assert len(rows) == nation_n
    total = sum(r.rank_scaled for r in rows)
    # truncating divisions and dangling nations only ever lose mass;
    # the final iteration's teleport term alone guarantees 15% of SCALE
    # even if every nation dangled.
    assert 0.15 * SCALE * 0.99 <= total <= SCALE
    assert all(r.rank_scaled > 0 for r in rows)
    # descending output order
    ranks = [r.rank_scaled for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_bloom_prefilter_equals_plain_join(spark, sf_dir):
    got = {
        r.l_returnflag: (r.n_items, r.revenue)
        for r in bloom_prefilter_join(spark, sf_dir).collect()
    }
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") == 1996)
        )
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {r.l_returnflag: r.n for r in plain} == {
        k: v[0] for k, v in got.items()
    }


def test_bloom_prefilter_plan_broadcasts_bucket_set(spark, sf_dir):
    plan = bloom_prefilter_join(spark, sf_dir)._jdf.queryExecution().toString()
    assert "LeftSemi" in plan and "Broadcast" in plan


def test_rollup_rank_levels_and_bounds(spark, sf_dir):
    rows = rollup_rank_mfgr_brand(spark, sf_dir).collect()
    assert all(1 <= r.rk <= TOPK for r in rows)
    # grand-total row: all-NULL dims, alone in its partition -> rank 1
    grand = [r for r in rows if r.p_mfgr is None]
    assert len(grand) == 1 and grand[0].rk == 1 and grand[0].p_brand is None
    # within each mfgr the subtotal (brand NULL) dominates every brand
    for r in rows:
        if r.p_mfgr is not None and r.p_brand is None:
            assert r.rk == 1
    # ranks are dense-start: every mfgr partition has a rank-1 row
    mfgrs = {r.p_mfgr for r in rows if r.p_mfgr is not None}
    for m in mfgrs:
        assert min(r.rk for r in rows if r.p_mfgr == m) == 1


def test_channel_union_counts_partition_events(spark, sf_dir):
    rows = channel_union_rollup(spark, sf_dir).collect()
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()
    assert {r.channel for r in rows} <= {"purchase", "signup", "other"}


def test_time_to_convert_deltas_positive(spark, sf_dir):
    rows = time_to_convert(spark, sf_dir).collect()
    for r in rows:
        assert r.n_converted > 0
        assert 0 <= r.median_s <= r.p90_s
