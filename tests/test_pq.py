"""PQ invariants: code compactness, ADC-vs-exact consistency, recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.operators import pq


@pytest.fixture(scope="module")
def prepared(spark, sf_dir):
    return pq._prepare(spark, sf_dir)


def test_codes_are_m_nibbles(prepared):
    coded, _ = prepared
    rows = coded.select("codes").collect()
    assert rows
    for r in rows:
        assert len(r["codes"]) == pq.M
        assert all(0 <= c < pq.K_SUB for c in r["codes"])


def test_adc_estimates_near_exact_distance(prepared):
    """ADC estimate must track the true unit-sphere squared distance:
    quantization error is bounded by the codebook resolution, so the
    mean absolute gap over all pairs stays well under the ~2.0 scale
    of unit-vector distances."""
    coded, books = prepared
    scored = pq._adc_scored(coded, books)
    exact = F.aggregate(
        F.zip_with("u", "qu", lambda x, y: (x - y) ** 2),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    gap = scored.select(
        F.avg(F.abs(F.col("est9") - exact)).alias("mae")
    ).first()["mae"]
    # unit vectors put squared distances on a [0, 4] scale clustered
    # around 2.0 for random data; even the 50-vector fixture (worst
    # case for PQ: uniform high-dim, tiny training set) must keep the
    # mean ADC gap under half the central scale.
    assert gap < 1.0, gap


def test_recall_gate_row(spark, sf_dir):
    row = pq.ann_pq_recall_detail(spark, sf_dir).first()
    assert row["recall"] >= row["gate"]
    assert row["n_hits"] <= row["n_truth"]
    assert row["recall_micro"] == row["n_hits"] * 1_000_000 // row["n_truth"]
    assert row["recall_ok"] == 1
    gated = pq.ann_pq_recall(spark, sf_dir).first()
    assert gated.recall_ok == 1 and gated.n_truth == row["n_truth"]
    assert gated.gate_micro == 800_000


def test_topk_bf_hit_column_matches_brute_force(spark, sf_dir):
    """ann_pq_topk_detail's in-row evidence column must be the true
    top-k membership indicator; the gated entry emits exactly the
    brute-force rows with the calibration flag."""
    from trace_parquet_spark.operators.similarity import cosine_topk

    bf = {(r.query_id, r.vec_id) for r in cosine_topk(spark, sf_dir).collect()}
    for r in pq.ann_pq_topk_detail(spark, sf_dir).collect():
        assert r.bf_hit == int((r.query_id, r.vec_id) in bf)
    gated = pq.ann_pq_topk(spark, sf_dir).collect()
    assert {(r.query_id, r.vec_id) for r in gated} == bf
    assert all(r.recall_ok == 1 for r in gated)
