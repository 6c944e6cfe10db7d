"""IVF ANN: deterministic training, cluster integrity, and recall
against brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from trace_parquet_spark.operators import ivf, similarity
from trace_parquet_spark.sources.registry import load_table


def test_centroids_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    c1 = ivf.train_centroids(emb)
    c2 = ivf.train_centroids(emb)
    assert c1 == c2
    assert len(c1) == ivf.K and len(c1[0]) == 64


def test_assignment_covers_all_vectors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf.train_centroids(emb)
    assigned = ivf._assign(emb, "embedding", cents)
    assert assigned.filter(F.col("cluster").isNull()).count() == 0
    n_clusters = assigned.select("cluster").distinct().count()
    assert 2 <= n_clusters <= ivf.K


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    brute = {
        (r.query_id, r.vec_id)
        for r in similarity.cosine_topk(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf.ann_ivf_topk_detail(spark, sf_dir).collect()
    }
    # k-means on near-uniform synthetic vectors is a coarse filter;
    # demand structural sanity + meaningful overlap
    assert len(approx) > 0
    recall = len(approx & brute) / len(brute)
    assert recall >= 0.2, f"recall {recall}"
    # the in-row evidence column must BE the membership indicator
    for r in ivf.ann_ivf_topk_detail(spark, sf_dir).collect():
        assert r.bf_hit == int((r.query_id, r.vec_id) in brute)
    # the gated registry entry emits exactly the brute-force rows with
    # the calibration flag set (oracle-derivable form)
    gated = ivf.ann_ivf_topk(spark, sf_dir).collect()
    assert {(r.query_id, r.vec_id) for r in gated} == brute
    assert all(r.recall_ok == 1 for r in gated)


def test_ivf_recall_row_evidence(spark, sf_dir):
    row = ivf.ann_ivf_recall_detail(spark, sf_dir).first()
    assert row.recall >= row.gate
    assert row.recall_micro == row.n_hits * 1_000_000 // row.n_truth
    assert row.recall_ok == 1
    gated = ivf.ann_ivf_recall(spark, sf_dir).first()
    assert gated.recall_ok == 1 and gated.n_truth == row.n_truth
    assert gated.gate_micro == 800_000


def test_collect_model_sized_guard(spark):
    # the guard that keeps "model-sized" collects honest: under the
    # cap it returns rows; a config error that makes the relation
    # data-sized raises instead of OOMing the driver at scale
    import pytest

    from trace_parquet_spark.session import collect_model_sized

    small = spark.range(5)
    assert len(collect_model_sized(small, 5, "five rows")) == 5
    with pytest.raises(RuntimeError, match="model-sized collect guard"):
        collect_model_sized(spark.range(100), 5, "too many rows")
