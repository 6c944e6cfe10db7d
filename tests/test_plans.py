"""Physical-plan shape guards: the properties that make these queries
scale (pushdown, broadcast, TakeOrdered) asserted on .explain output
so regressions fail loudly instead of silently costing a shuffle."""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as e

    return e.queries()


def test_trace_filter_pushdown(spark, sf_dir, qs):
    """Both reference predicates must reach the parquet reader: the
    IN-list AND the inclusive time range (row-group pruning via min/max
    stats — at 100 TB time is the pruning dimension of events)."""
    plan = _plan(qs["trace_filter_export"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "In(user_id" in plan
    assert "GreaterThanOrEqual(ts" in plan
    assert "LessThanOrEqual(ts" in plan


def test_q1_pushdown_and_partial_agg(spark, sf_dir, qs):
    plan = _plan(qs["q1_pricing_summary"](spark, sf_dir))
    assert "LessThanOrEqual(l_shipdate" in plan
    # partial (map-side) aggregation before the exchange
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_q3_broadcasts_customer(spark, sf_dir, qs):
    plan = _plan(qs["q3_shipping_priority"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_dims(spark, sf_dir, qs):
    plan = _plan(qs["q5_region_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_topk_is_take_ordered(spark, sf_dir, qs):
    plan = _plan(qs["topk_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_column_pruning_reaches_scan(spark, sf_dir, qs):
    plan = _plan(qs["topk_orders"](spark, sf_dir))
    # only the 3 projected columns are read from the file
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>" in plan


def test_semi_join_stays_semi(spark, sf_dir, qs):
    plan = _plan(qs["semi_join_big_spenders"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_no_python_in_relational_hot_path(spark, sf_dir, qs):
    """Relational queries must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes) — UDFs are reserved for gzip + multimodal."""
    for name in ("q1_pricing_summary", "q3_shipping_priority",
                 "sessionize_events", "dedup_minhash_lsh", "cosine_topk"):
        plan = _plan(qs[name](spark, sf_dir))
        assert "EvalPython" not in plan, name


def test_bm25_topk_is_take_ordered_and_jvm_side(spark, sf_dir, qs):
    plan = _plan(qs["bm25_search"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_fuzzy_pairs_blocked_no_cartesian_on_part(spark, sf_dir, qs):
    """The gram-blocking join must carry the candidate generation; the
    only cross product allowed is the bounded short-string fallback."""
    plan = _plan(qs["fuzzy_part_pairs"](spark, sf_dir))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )


def test_q6_filters_reach_scan(spark, sf_dir, qs):
    plan = _plan(qs["q6_forecast_revenue"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan and "l_quantity" in plan


def test_q19_broadcasts_part(spark, sf_dir, qs):
    plan = _plan(qs["q19_discounted_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_merge_upsert_single_shuffle_key(spark, sf_dir, qs):
    plan = _plan(qs["merge_upsert_user_state"](spark, sf_dir))
    assert "FullOuter" in plan or "SortMergeJoin" in plan


def test_q2_broadcasts_dims_after_lineitem_collapse(spark, sf_dir, qs):
    """Q2: lineitem collapses to (part, supp) grain in one partial-agg
    shuffle; supplier/nation/region join broadcast after that."""
    plan = _plan(qs["q2_min_cost_supplier"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_q13_left_outer_preserved(spark, sf_dir, qs):
    plan = _plan(qs["q13_customer_distribution"](spark, sf_dir))
    assert "LeftOuter" in plan


def test_q21_semi_anti_stay_semi_anti(spark, sf_dir, qs):
    """Q21's EXISTS/NOT EXISTS must compile to semi/anti joins, not
    inner-join + dedup (which would duplicate the probe side)."""
    plan = _plan(qs["q21_waiting_orders"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q20_no_cartesian(spark, sf_dir, qs):
    plan = _plan(qs["q20_dominant_suppliers"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_time_rollup_single_expand(spark, sf_dir, qs):
    plan = _plan(qs["time_rollup_counts"](spark, sf_dir))
    assert plan.count("Expand") == 1


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir, qs):
    """When the dim side is too big to broadcast, Spark should inject a
    runtime Bloom filter from the filtered dim build side into the fact
    scan — the row-level analog of DPP. Pinned here with thresholds
    forced so the rewrite is observable on test-sized data."""
    from pyspark.sql import functions as F

    from trace_parquet_spark.sources.registry import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").filter(
            F.col("p_retailprice") > 1900
        )
        j = (
            li.join(part, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand")
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "bloom" in opt
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_scalar_subqueries_decorrelate(spark, sf_dir, qs):
    """Correlated scalar subqueries must become per-key aggregates
    joined back — never a per-row re-execution or cross product."""
    plan = _plan(qs["scalar_subquery_order_stats"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2


def test_not_in_compiles_to_anti_join(spark, sf_dir, qs):
    plan = _plan(qs["not_in_null_aware"](spark, sf_dir))
    assert "LeftAnti" in plan


def test_round4_plans_stay_jvm_and_broadcast(spark, sf_dir, qs):
    """Round-4 operators: no Python eval in relational paths (the MG
    sketch's MapInPandas is the one sanctioned Python stage), no
    sort-merge joins of provably-tiny relations."""
    for name in ("pagerank_trade_graph", "mixture_sample_docs",
                 "event_transition_matrix", "doc_surprisal",
                 "cascade_forget_audit", "zorder_layout_stats"):
        plan = _plan(qs[name](spark, sf_dir))
        assert "EvalPython" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_bpe_rank_is_take_ordered(spark, sf_dir, qs):
    """The BPE merge ranking must select top-k via
    TakeOrderedAndProject (per-partition k + driver merge); the rank
    window may only ever see the K-row result — never the full pair
    relation on one partition."""
    for name in ("bpe_top_merges", "bpe_vocab_coverage"):
        plan = _plan(qs[name](spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, name


def test_top_tokens_semi_join_prunes_before_shuffle(spark, sf_dir, qs):
    plan = _plan(qs["top_tokens_exact"](spark, sf_dir))
    assert "MapInPandas" in plan          # the sketch stage
    assert "LeftSemi" in plan             # candidates prune the recount
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_pagerank_caches_probs_once(spark, sf_dir, qs):
    plan = _plan(qs["pagerank_trade_graph"](spark, sf_dir))
    # every iteration reads the cached edge relation instead of
    # re-running the lineitem join-aggregate
    assert plan.count("InMemoryTableScan") >= 3


def test_codec_roundtrips_are_arrow_batched(spark, sf_dir, qs):
    """The image/audio/video round-trip queries must run their Python
    stages as Arrow-batched MapInPandas — never row-at-a-time
    BatchEvalPython — and carry no shuffle between encode and decode
    (both stages share the doc_id repartition)."""
    for name in ("image_decode_roundtrip", "audio_decode_roundtrip",
                 "video_decode_roundtrip"):
        plan = _plan(qs[name](spark, sf_dir))
        assert "MapInPandas" in plan, name
        assert "BatchEvalPython" not in plan, name
        # one Exchange for the doc_id repartition + the final sort's —
        # an extra one would mean the encode->decode hop shuffles
        assert plan.count("Exchange") <= 2, (name, plan[:1500])


def test_scd2_pit_join_avoids_range_join(spark, sf_dir, qs):
    """The point-in-time dimension lookup must compile to the
    union+carry window plan — one user_id shuffle, zero interval
    self-joins: a fact⋈interval BETWEEN join would appear as a
    nested-loop/cartesian node and blow up at scale."""
    plan = _plan(qs["scd2_pit_join"](spark, sf_dir))
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    # the carry is a window over the unioned stream, not a join
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Window") >= 2  # version numbering + the carry


def test_kmv_overlap_touches_users_once(spark, sf_dir, qs):
    """Pair estimation must run on sketch rows only: no join in the
    plan carries the distinct-user relation twice except the exact
    evidence join; no Python, no cartesian."""
    plan = _plan(qs["kmv_segment_overlap"](spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_ks_drift_windows_partition_by_source(spark, sf_dir, qs):
    """The CDF windows must partition by source (never a global
    window) and the plan stays JVM-side."""
    plan = _plan(qs["ks_drift_by_source"](spark, sf_dir))
    assert "EvalPython" not in plan
    import re as _re

    # every Window node's partition spec mentions source
    specs = _re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    win_specs = [s for s in specs if s]
    assert win_specs, "expected window nodes in the KS plan"
    assert all("source" in s for s in win_specs), win_specs


def test_market_basket_supports_broadcast(spark, sf_dir, qs):
    """Item supports and the scalar basket count ride broadcasts; the
    only shuffle join is the basket self-join on the order key."""
    plan = _plan(qs["market_basket_rules"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") <= 1


def test_weighted_sample_is_take_ordered(spark, sf_dir, qs):
    plan = _plan(qs["weighted_sample_docs"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan
