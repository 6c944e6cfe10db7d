"""LSH twins of the pair-eval operators (hard_negative_mining_lsh,
knn_label_vote_lsh): the sub-quadratic candidate generation must (a)
never fabricate results — every emitted pair is a genuine cross-label
pair with the exact cosine, independently recomputed in numpy — and
(b) retain useful recall vs the exact all-pairs twins. Thresholds sit
below the measured values on the near-uniform synthetic embeddings
(hn pair recall 0.43, knn accuracy gap 0.014 at sf0.001); real
clustered embeddings sit far higher (see similarity.ann_lsh_recall_eval
docstring)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as papq
import pytest

from trace_parquet_spark.operators import semantic as S


@pytest.fixture(scope="module")
def vecs(sf_dir):
    t = papq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    return {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in t.itertuples()
    }


def test_hard_negative_lsh_pairs_are_genuine(spark, sf_dir, vecs):
    """No fabricated negatives: each emitted cosine equals the exact
    dot/(|a||b|) recomputed outside Spark, on the output grid."""
    rows = S.hard_negative_mining_lsh(spark, sf_dir).collect()
    assert rows
    for r in rows:
        a, b = vecs[r.query_id], vecs[r.vec_id]
        cos = float(a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b))
        assert abs(r.cosine - round(round(cos, 9), 6)) <= 1e-6, (
            r.query_id, r.vec_id)


def test_hard_negative_lsh_recall_vs_exact(spark, sf_dir):
    exact = {(r.query_id, r.vec_id)
             for r in S.hard_negative_mining(spark, sf_dir).collect()}
    lsh = {(r.query_id, r.vec_id)
           for r in S.hard_negative_mining_lsh(spark, sf_dir).collect()}
    assert len(exact & lsh) / len(exact) >= 0.30


def test_knn_vote_lsh_covers_all_vectors_and_tracks_exact(spark, sf_dir):
    """Every vector must collide with SOMETHING (coverage = exact
    twin's), and the aggregate accuracy must track the exact LOO
    accuracy — the eval stays usable when the kernel is swapped."""
    ex = S.knn_label_vote(spark, sf_dir).collect()
    ls = S.knn_label_vote_lsh(spark, sf_dir).collect()
    assert sum(r.n_vecs for r in ls) == sum(r.n_vecs for r in ex)
    e_acc = sum(r.n_correct for r in ex) / sum(r.n_vecs for r in ex)
    l_acc = sum(r.n_correct for r in ls) / sum(r.n_vecs for r in ls)
    assert abs(e_acc - l_acc) <= 0.05


def test_lsh_kernel_plan_has_no_cartesian(spark, sf_dir):
    """The twin exists to kill the O(N²) shape: candidates must come
    from the bucket equi-join, never a nested-loop cross product."""
    for fn in (S.hard_negative_mining_lsh, S.knn_label_vote_lsh):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, fn.__name__
        # the exact kernel's broadcast nested loop must be gone too
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
