"""Round-6 pins: repetition/boilerplate metrics and their plan shapes."""

from __future__ import annotations

from trace_parquet_spark.operators import repetition


def test_repetition_ppm_bounds(spark, sf_dir):
    rows = repetition.repetition_metrics_docs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["dup_word_ppm"] <= 1_000_000
        assert 0 <= r["top_2gram_char_ppm"] <= 1_000_000
        assert 0 <= r["dup_3gram_char_ppm"] <= 1_000_000
        # a doc with any repeated word pair necessarily has dup words
        if r["dup_3gram_char_ppm"] > 0:
            assert r["dup_word_ppm"] > 0


def test_boilerplate_fraction_consistent(spark, sf_dir):
    rows = repetition.boilerplate_shingle_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hot"] <= r["n_shingles"]
        expected_keep = int(r["boilerplate_ppm"] <= 300_000)
        assert r["keep"] == expected_keep


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_boilerplate_hot_join_is_broadcast(spark, sf_dir):
    plan = _plan(repetition.boilerplate_shingle_stats(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_repetition_no_python_udf_in_plan(spark, sf_dir):
    plan = _plan(repetition.repetition_metrics_docs(spark, sf_dir))
    assert "Python" not in plan


def test_bfs_every_wave_has_edge_predecessor(spark, sf_dir):
    from pyspark.sql import functions as F

    from trace_parquet_spark.plans import graph_rank

    out = graph_rank.bfs_trade_levels(spark, sf_dir)
    edges = (
        graph_rank._trade_probs(spark, sf_dir)
        .where(
            (F.col("p") >= graph_rank.BFS_P_MIN)
            & (F.col("src") != F.col("dst"))
        )
        .select("src", "dst")
    )
    lvl = {(r["root"], r["node"]): r["level"] for r in out.collect()}
    es = [(r["src"], r["dst"]) for r in edges.collect()]
    roots = {root for (root, node) in lvl}
    assert all(lvl[(r, r)] == 0 for r in roots)
    for (root, node), d in lvl.items():
        if d == 0:
            continue
        preds = [src for (src, dst) in es if dst == node]
        assert any(lvl.get((root, src)) == d - 1 for src in preds), (
            root,
            node,
            d,
        )


def test_lateral_decorrelates(spark, sf_dir):
    from trace_parquet_spark.plans import subqueries

    plan = _plan(subqueries.lateral_top_order_per_customer(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
