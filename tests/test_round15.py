"""Round-15 pins: bench harness steal gating + per-cpus detail files.

These are pure-Python (no Spark session) — they pin the measurement
harness semantics the round-14 verdict asked for (tasks 2 and 3):
a hypervisor-steal-contaminated rep can never be the min-of-N winner
while a clean rep exists, contaminated reps earn bounded replacement
attempts, and the detail artifact is written per core count so the
driver's 8-core scaling run no longer clobbers the 32-core detail.
"""

from __future__ import annotations

import importlib.util
import itertools
import os
import types

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_clocks(bench, steals, elapsed_per_rep):
    """Install deterministic clocks: per rep, _steal_s is read twice
    (before/after) and perf_counter twice (t0/t1)."""
    steal_seq = iter(steals)
    t = itertools.count()
    times = []
    acc = [0.0]

    def perf_counter():
        # alternate t0 / t1 reads; t1 - t0 == next planned elapsed
        i = next(t)
        if i % 2 == 0:
            times.append(acc[0])
            return acc[0]
        acc[0] += elapsed_per_rep[i // 2]
        return acc[0]

    bench._steal_s = lambda: next(steal_seq)
    bench.time = types.SimpleNamespace(perf_counter=perf_counter)


def test_contaminated_rep_cannot_win(bench_mod):
    # rep0: steal 3.0s, fastest wall (inflation can still "win" raw
    # min); rep1/rep2 (replacement): clean, slower. Gate must pick the
    # fastest CLEAN rep and count one discarded rep.
    _fake_clocks(bench_mod, steals=[0.0, 3.0, 3.0, 3.0, 3.0, 3.0],
                 elapsed_per_rep=[1.0, 5.0, 4.0])
    best, steal, discarded = bench_mod._timed_min_of(2, lambda: None)
    assert best == 4.0
    assert steal == 0.0
    assert discarded == 1


def test_all_contaminated_keeps_best_dirty_with_steal(bench_mod):
    # every rep contaminated: budget is planned + STEAL_MAX_EXTRA_REPS,
    # the best dirty rep is kept and its steal recorded (honest artifact)
    n = 2 + bench_mod.STEAL_MAX_EXTRA_REPS
    _fake_clocks(bench_mod, steals=[0.0, 2.0] * n,
                 elapsed_per_rep=[7.0] * n)
    best, steal, discarded = bench_mod._timed_min_of(2, lambda: None)
    assert best == 7.0
    assert steal == 2.0
    assert discarded == n


def test_clean_run_is_plain_min_of_n(bench_mod):
    _fake_clocks(bench_mod, steals=[0.0] * 8, elapsed_per_rep=[4.0, 2.0])
    seen = []
    best, steal, discarded = bench_mod._timed_min_of(
        2, lambda: "df", post_first_rep=seen.append
    )
    assert best == 2.0
    assert steal == 0.0
    assert discarded == 0
    # the post-rep hook (window audit) fires exactly once, on rep 0
    assert seen == ["df"]


def test_packed_simhash_equals_per_bit_conditional_sums(spark, sf_dir):
    """The round-15 packed-lane SimHash aggregation (_packed_bit_ones:
    two 32-bit counters per BIGINT lane, majority = 2*ones > n) must be
    bit-identical to the retired per-bit ±1 conditional-sum shape. The
    old shape is reconstructed inline and both are compared row-for-row
    on the 64-bit variant (sign-bit recombination included)."""
    from pyspark.sql import functions as F

    from trace_parquet_spark.functions.hashing import stable_hash32_x4
    from trace_parquet_spark.functions.text import tokens
    from trace_parquet_spark.operators.dedup import (
        _SIMHASH64_SEED,
        SIMHASH64_BITS,
        simhash64_docs,
    )
    from trace_parquet_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    hs = stable_hash32_x4(F.col("t"), _SIMHASH64_SEED)
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("t")
    ).select("doc_id", hs[0].alias("h0"), hs[1].alias("h1"))
    old_bits = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(
                        F.col("h0" if j < 32 else "h1"), j % 32
                    ).bitwiseAND(1)
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(SIMHASH64_BITS)
        ]
    )
    sim = None
    for j in range(SIMHASH64_BITS):
        mag = -(2**63) if j == 63 else 2**j
        term = F.when(
            F.col(f"b{j}") > 0, F.lit(mag).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    old = {
        r.doc_id: r.simhash64
        for r in old_bits.select("doc_id", sim.alias("simhash64")).collect()
    }
    new = {
        r.doc_id: r.simhash64 for r in simhash64_docs(spark, sf_dir).collect()
    }
    assert old == new and len(new) > 0


def test_detail_artifact_is_per_cpus(bench_mod):
    # the emit site writes BENCH_detail_c{cpus}.json and points the
    # stdout line at that name (round-14 verdict task 2)
    src = open(os.path.join(_ROOT, "bench.py")).read()
    assert 'f"BENCH_detail_c{cpus}.json"' in src
    assert '"detail": detail_name' in src
