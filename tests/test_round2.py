"""Round-2 additions: explicit GROUPING SETS and the Python UDTF."""

from __future__ import annotations

from pyspark.sql import functions as F

from trace_parquet_spark.operators.udtf import (
    ExplodeTokens,
    _norm_tokens,
    explode_tokens_udtf,
)
from trace_parquet_spark.plans.grouping_sets import grouping_sets_revenue


def test_grouping_sets_single_expand_plan(spark, sf_dir):
    df = grouping_sets_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one Expand feeding one aggregation — not a union of re-scans
    assert plan.count("Expand") == 1
    rows = df.collect()
    # the grand-total row exists exactly once
    totals = [r for r in rows if r.region_name == "ALL"]
    assert len(totals) == 1 and totals[0].segment == "ALL"
    # (segment)-only set is absent: every non-ALL region row carries
    # either a real segment or ALL, but no (ALL, segment) rows exist
    assert not [r for r in rows if r.region_name == "ALL" and r.segment != "ALL"]
    # per-region subtotal equals the sum of its segment rows
    by_region = {}
    for r in rows:
        if r.region_name != "ALL" and r.segment != "ALL":
            by_region.setdefault(r.region_name, 0)
            by_region[r.region_name] += r.n_customers
    for r in rows:
        if r.region_name != "ALL" and r.segment == "ALL":
            assert by_region[r.region_name] == r.n_customers


def test_udtf_tokenization_matches_engine_norm():
    assert _norm_tokens("  Hello   World ") == ["hello", "world"]
    assert _norm_tokens("") == []
    assert _norm_tokens("   ") == []
    assert _norm_tokens(None) == []
    assert list(ExplodeTokens().eval(7, "A  b")) == [(7, 1, "a"), (7, 2, "b")]


def test_udtf_rows_align_with_jvm_tokens(spark, sf_dir):
    from trace_parquet_spark.functions.text import tokens
    from trace_parquet_spark.sources.registry import load_table

    out = explode_tokens_udtf(spark, sf_dir)
    got = (
        out.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.max("pos").alias("maxpos"))
        .collect()
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 100) & (F.length(F.trim("text")) > 0))
        .select("doc_id", F.size(tokens("text")).alias("n_jvm"))
        .collect()
    )
    jvm = {r.doc_id: r.n_jvm for r in docs}
    assert len(got) == len(jvm)
    for r in got:
        assert r.n == r.maxpos == jvm[r.doc_id]


def test_connected_components_chain_and_triangle(spark):
    from trace_parquet_spark.operators.dedup_clusters import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain 1-2-3-4
         (10, 11), (11, 12), (10, 12),  # triangle
         (20, 21)],                   # isolated pair
        "src long, dst long",
    )
    got = {
        r.doc_id: r.cluster_id for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}
