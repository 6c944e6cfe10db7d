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


def test_dsir_ranks_target_like_docs_higher(spark, tmp_path):
    """DSIR weight must order raw docs by target-vocabulary affinity:
    a raw doc written in the target domain's vocabulary outranks one
    with disjoint vocabulary."""
    import pandas as pd

    from trace_parquet_spark.operators.mixture import DSIR_K, dsir_select_docs

    rows = []
    # target corpus (src0/src1): "alpha beta gamma" vocabulary
    for i in range(20):
        rows.append((i, "alpha beta gamma alpha beta", "en", "src0", 0))
    # raw pool: doc 100 speaks the target vocabulary, 101.. do not
    rows.append((100, "alpha beta gamma beta alpha", "en", "src2", 0))
    for i in range(101, 120):
        rows.append((i, "zot qux flim blorp wibble", "en", "src3", 0))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = str(tmp_path / "sf")
    spark.createDataFrame(pdf).write.parquet(f"{sf}/documents.parquet")
    out = dsir_select_docs(spark, sf).collect()
    assert out, "selection must be non-empty"
    assert out[0]["doc_id"] == 100  # target-like doc wins
    assert out[0]["weight_micro"] > out[-1]["weight_micro"]
    assert len(out) <= DSIR_K


def test_dsir_plan_is_topk_not_global_sort(spark, sf_dir):
    from trace_parquet_spark.operators.mixture import dsir_select_docs

    plan = dsir_select_docs(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # all-native pipeline: no Python eval anywhere in the plan
    assert "EvalPython" not in plan


def test_containment_invariants(spark, sf_dir):
    """Every emitted containment is >= the threshold, directions are
    asymmetric rows, and a mutual pair (equal sizes, full overlap)
    appears in BOTH directions."""
    from trace_parquet_spark.operators.dedup import (
        CONTAIN_DEN,
        CONTAIN_NUM,
        dedup_containment_pairs,
    )

    rows = dedup_containment_pairs(spark, sf_dir).collect()
    assert rows, "fixture corpus contains near-dup docs"
    tau = CONTAIN_NUM / CONTAIN_DEN
    for r in rows:
        assert r.contained_doc != r.container_doc
        assert r.containment >= tau - 5e-7
    # near-dups of similar size clear the threshold both ways -> the
    # relation must contain at least one mutually-contained pair
    directed = {(r.contained_doc, r.container_doc) for r in rows}
    assert directed & {(b, a) for (a, b) in directed}, (
        "expected at least one mutually-contained pair"
    )


def test_canonical_quality_picks_longest_member(spark, sf_dir):
    """The survivor is a member of its own cluster and no member has
    more words (independent re-derivation from the labels)."""
    from pyspark.sql import functions as F

    from trace_parquet_spark.functions.text import tokens
    from trace_parquet_spark.operators.dedup_clusters import (
        dedup_canonical_quality,
        dedup_clusters,
    )
    from trace_parquet_spark.sources.registry import load_table

    canon = dedup_canonical_quality(spark, sf_dir)
    labels = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    words = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_words")
    )
    best = (
        labels.join(words, "doc_id")
        .groupBy("cluster_id")
        .agg(F.max("n_words").alias("best_words"))
    )
    j = canon.join(best, "cluster_id").collect()
    assert j
    for r in j:
        assert r.canonical_words == r.best_words
    # canonical is a member of the cluster it represents
    member = canon.join(
        labels,
        (canon.canonical_doc_id == labels.doc_id)
        & (canon.cluster_id == labels.cluster_id),
        "left_anti",
    )
    assert member.count() == 0


def test_semantic_decontam_excludes_eval_side(spark, sf_dir):
    from trace_parquet_spark.operators.semantic import (
        SEM_EVAL_MOD,
        decontaminate_semantic,
    )

    rows = decontaminate_semantic(spark, sf_dir).collect()
    assert rows, "fixture embeddings contain eval-similar vectors"
    for r in rows:
        assert r.vec_id % SEM_EVAL_MOD != 0
        assert r.n_eval_hits >= 1


def test_random_projection_matches_numpy_replay(spark, sf_dir):
    """Exact-integer JL projection equals an independent numpy replay
    (same micro grid, same md5 sign matrix) cell for cell."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from trace_parquet_spark.operators.featurize import (
        RP_IN_DIM,
        RP_MICRO,
        RP_OUT_DIM,
        random_projection_embed,
    )

    tb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pydict()
    signs = np.empty((RP_IN_DIM, RP_OUT_DIM), dtype=np.int64)
    for i in range(RP_IN_DIM):
        for j in range(RP_OUT_DIM):
            h = int(hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()[:8], 16)
            signs[i, j] = 1 if h % 2 == 0 else -1
    xm = np.floor(
        np.asarray(tb["embedding"], dtype=np.float64) * RP_MICRO + 0.5
    ).astype(np.int64)
    want = xm @ signs  # (n, RP_OUT_DIM)
    got = {}
    for r in random_projection_embed(spark, sf_dir).collect():
        got[(r.vec_id, r.j)] = r.proj_micro
    ids = tb["vec_id"]
    assert len(got) == len(ids) * RP_OUT_DIM
    for row, vid in enumerate(ids):
        for j in range(RP_OUT_DIM):
            assert got[(vid, j)] == want[row, j]


def test_linear_attribution_conserves_revenue(spark, sf_dir):
    """Credits across all channels (incl. direct) must sum exactly to
    total purchase revenue on the micro-cent grid — the remainder
    assignment makes the books balance by construction."""
    from pyspark.sql import functions as F

    from trace_parquet_spark.plans.temporal import attribution_linear
    from trace_parquet_spark.sources.registry import load_table

    total_credit = (
        attribution_linear(spark, sf_dir)
        .agg(F.sum("credit_micro_total"))
        .collect()[0][0]
    )
    total_cents = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            )
        )
        .collect()[0][0]
    )
    assert total_credit == total_cents * 1_000_000
