"""Deterministic KLL quantile sketch (operators/kll.py): weight
conservation, tracked error bound, merge order-invariance, and the
Spark entry's in-row guarantee."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trace_parquet_spark.operators.kll import (
    KLL_K,
    KLL_Q_PPM,
    _compact,
    _feed,
    _merge_and_answer,
    _sketch_partition,
)


def _weights(levels):
    return np.concatenate(
        [np.full(len(b), 1 << h, dtype=np.int64) for h, b in enumerate(levels)]
    ) if levels else np.empty(0, dtype=np.int64)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 50_000))
def test_kll_weight_conservation_and_bound(seed, n):
    """Σ(item weight) must equal n exactly (odd buffers hold one item
    back), and every quantile's exact rank error must respect the
    sketch's own tracked bound."""
    rs = np.random.RandomState(seed)
    data = rs.randint(0, 1_000_000, n)
    levels, err = [], 0
    for chunk in np.array_split(data, max(1, n // 1000)):
        levels, err = _feed(levels, err, chunk)
    w = _weights(levels)
    assert int(w.sum()) == n
    assert all(len(b) <= KLL_K for b in levels[:-1] or [levels[0]])
    vals = np.concatenate(levels)
    order = np.argsort(vals)
    vals, w = vals[order], w[order]
    cum = np.cumsum(w)
    sdata = np.sort(data)
    bound = err + int(w.max())
    for q in (0.05, 0.5, 0.95):
        target = int(q * n)
        idx = min(int(np.searchsorted(cum, target, "left")), len(vals) - 1)
        true_rank = int(np.searchsorted(sdata, vals[idx], "right"))
        assert abs(true_rank - target) <= bound


def test_kll_merge_is_order_invariant():
    """The combine stage depends only on the level multisets: feeding
    the same partition sketches in any order yields identical output."""
    rs = np.random.RandomState(3)
    parts = []
    for i in range(6):
        pdf = pd.DataFrame({"value": rs.randint(0, 10_000_000, 20_000)})
        parts.append(next(_sketch_partition(iter([pdf]))))
    fwd = next(_merge_and_answer(iter(parts)))
    rev = next(_merge_and_answer(iter(parts[::-1])))
    pd.testing.assert_frame_equal(fwd, rev)
    # and as one concatenated batch
    one = next(_merge_and_answer(iter([pd.concat(parts, ignore_index=True)])))
    pd.testing.assert_frame_equal(fwd, one)


def test_kll_sketch_is_bounded():
    """Sketch size stays O(K log(n/K)) regardless of input order."""
    data = np.arange(500_000)  # sorted adversarial order
    levels, err = [], 0
    for chunk in np.array_split(data, 100):
        levels, err = _feed(levels, err, chunk)
    size = sum(len(b) for b in levels)
    assert size <= KLL_K * (len(levels) + 1)
    assert len(levels) <= 16


def test_kll_spark_entry_within_bound(spark, sf_dir):
    from trace_parquet_spark.operators.kll import kll_quantile_detail

    rows = kll_quantile_detail(spark, sf_dir).orderBy("q_ppm").collect()
    assert [r.q_ppm for r in rows] == KLL_Q_PPM
    assert all(r.within_bound for r in rows)
    assert all(r.n == rows[0].n for r in rows)
    # determinism under replay: a second build is identical
    again = kll_quantile_detail(spark, sf_dir).orderBy("q_ppm").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]
    # the gated registry entry is the oracle-derivable projection
    gated = __import__("__spark_entry__").queries()["kll_quantile_sketch"](
        spark, sf_dir
    ).collect()
    assert [(g.q_ppm, g.n, g.target_rank, g.within_bound) for g in gated] == [
        (r.q_ppm, r.n, r.target_rank, int(r.within_bound)) for r in rows
    ]
    # cross-engine evidence: DuckDB independently re-derives the exact
    # rank of every estimate — the in-row true_rank must match it
    import duckdb

    con = duckdb.connect()
    for r in rows:
        rank = con.execute(
            f"""SELECT count(*) FROM read_parquet('{sf_dir}/orders.parquet')
                WHERE CAST(floor(o_totalprice*100+0.5) AS BIGINT)
                      <= {r.est_value}"""
        ).fetchone()[0]
        assert rank == r.true_rank, (r.q_ppm, rank, r.true_rank)
        assert abs(rank - r.target_rank) <= r.bound
