"""Tests for the training-data-pipeline operators: dedup recall/
precision relationships, ANN-vs-brute-force recall, and multimodal
plumbing (the image codecs themselves are covered in
test_image_codec.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.operators import dedup, multimodal, similarity
from trace_parquet_spark.sources.registry import load_table


def test_minhash_lsh_subset_of_exact(spark, sf_dir):
    """LSH output must be a subset of the exact n-gram pairs (verify
    step guarantees precision = 1 vs the thresholded ground truth)."""
    exact = {
        (r.doc_a, r.doc_b) for r in dedup.dedup_ngram_pairs(spark, sf_dir).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b) for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert lsh <= exact
    # planted near-dups are ~0.97 jaccard: 4x4 banding recall should be high
    if exact:
        assert len(lsh) / len(exact) >= 0.9


def test_simhash_near_dups_close(spark, sf_dir):
    """Docs that are near-dups by jaccard should have close simhashes."""
    pairs = dedup.dedup_ngram_pairs(spark, sf_dir).filter(F.col("jaccard") > 0.9)
    sims = {r.doc_id: r.simhash for r in dedup.simhash_docs(spark, sf_dir).collect()}
    for r in pairs.collect():
        ham = bin(sims[r.doc_a] ^ sims[r.doc_b]).count("1")
        assert ham <= 6, (r.doc_a, r.doc_b, ham)


def test_ann_recall_vs_brute_force(spark, sf_dir):
    brute = {
        (r.query_id, r.vec_id)
        for r in similarity.cosine_topk(spark, sf_dir).collect()
    }
    ann = {
        (r.query_id, r.vec_id)
        for r in similarity.ann_lsh_topk(spark, sf_dir).collect()
    }
    # 8-plane single-table LSH on near-uniform vectors is a weak filter;
    # just require overlap and correct per-query cardinality
    assert len(ann & brute) > 0
    per_q = {}
    for q, v in ann:
        per_q[q] = per_q.get(q, 0) + 1
    assert all(n <= similarity.TOP_K for n in per_q.values())


def test_multimodal_plumbing_and_stub(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    blobs = multimodal.attach_blob(docs)
    feats = multimodal.fake_decode_features(blobs)
    row = feats.filter(F.col("doc_id") == 0).collect()[0]
    text0 = docs.filter(F.col("doc_id") == 0).collect()[0].text
    assert row.byte_len == len(text0.encode())
    assert row.first_byte == text0.encode()[0]
    # formats without a pure-numpy decoder still fail loudly at the
    # codec seam (a compressed-codec lib would add a branch there)
    with pytest.raises(ValueError, match="magic"):
        multimodal.decode_image(b"\x89PNG")


def test_dedup_exact_all_unique_here(spark, sf_dir):
    """Synthetic corpus has no byte-identical dups at this sf — exact
    dedup must therefore keep every doc (n_copies == 1)."""
    out = dedup.dedup_exact(spark, sf_dir)
    assert out.filter(F.col("n_copies") > 1).count() == 0
    assert out.count() == load_table(spark, sf_dir, "documents").count()
