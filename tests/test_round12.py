"""Round-12 pins: the 64-bit SimHash scale twin (Manku-Jain-Sarma
2007 chunk widths — closes the round-11 30×-probe superlinearity
finding on simhash_hamming_pairs), the ChunkSpaceHint pointing the
32-bit anchor at it, and the scale-hint hardening from the round-11
advice (call-time env read, sizing-source validation, parquet-footer
short-circuit)."""

from __future__ import annotations

import warnings as w

import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.operators import scale_hints
from trace_parquet_spark.operators.dedup import (
    HAM64_CHUNKS,
    HAM64_MAX,
    simhash64_docs,
    simhash64_hamming_pairs,
    simhash_hamming_pairs,
)


# ------------------------- 64-bit SimHash twin


def test_simhash64_signature_uses_full_width(spark, sf_dir):
    """Signatures must actually populate the upper 32 bits (including
    the sign bit carried as bit 63) — a twin that silently computed
    32-bit signatures would pass the pairs oracle while keeping the
    256-value chunk space it exists to escape."""
    sims = simhash64_docs(spark, sf_dir)
    stats = sims.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("simhash64") < 0, 1).otherwise(0)).alias(
            "n_negative"
        ),
        F.sum(
            F.when(
                F.shiftright(F.col("simhash64"), 32).bitwiseAND((1 << 32) - 1)
                != 0,
                1,
            ).otherwise(0)
        ).alias("n_upper_set"),
    ).first()
    assert stats.n > 0
    # ~half of random signatures set the sign bit; require a healthy
    # fraction rather than an exact split
    assert stats.n_negative > stats.n * 0.2
    assert stats.n_upper_set > stats.n * 0.9


def test_simhash64_pigeonhole_recall_is_exact(spark, sf_dir):
    """The 4×16-bit chunk blocking must find EXACTLY the all-pairs
    ≤HAM64_MAX set (pigeonhole: 3 flips touch ≤3 of 4 chunks). The
    driver oracle proves this vs DuckDB; this pin proves it
    in-engine against a Spark all-pairs derivation, so a blocking
    regression fails fast in pytest."""
    sims = simhash64_docs(spark, sf_dir).collect()
    expected = set()
    for i, ra in enumerate(sims):
        for rb in sims[i + 1 :]:
            x = (ra.simhash64 ^ rb.simhash64) & ((1 << 64) - 1)
            if bin(x).count("1") <= HAM64_MAX:
                pair = (
                    min(ra.doc_id, rb.doc_id),
                    max(ra.doc_id, rb.doc_id),
                )
                expected.add(pair)
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash64_hamming_pairs(spark, sf_dir).collect()
    }
    assert got == expected


def test_simhash64_chunks_cover_the_word():
    """4 × 16 must cover all 64 bits and support radius CHUNKS-1."""
    assert HAM64_CHUNKS * 16 == 64
    assert HAM64_MAX == HAM64_CHUNKS - 1


def test_simhash32_anchor_hints_at_64bit_twin(spark, sf_dir, monkeypatch):
    """Past the chunk-space factor the 32-bit anchor must emit a
    ChunkSpaceHint naming simhash64_hamming_pairs; at the default
    factor it stays silent at test SF (500 docs ≤ 32×256)."""
    monkeypatch.setenv("SPARK_GRAFT_CHUNK_HINT_FACTOR", "1")
    # 500 docs > 1×256 -> fires (env read at call time, chunk space 256)
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        simhash_hamming_pairs(spark, sf_dir).take(1)
    hints = [
        c
        for c in caught
        if issubclass(c.category, scale_hints.ChunkSpaceHint)
    ]
    assert hints, "32-bit anchor emitted no ChunkSpaceHint"
    assert "simhash64_hamming_pairs" in str(hints[0].message)
    monkeypatch.delenv("SPARK_GRAFT_CHUNK_HINT_FACTOR")
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        simhash_hamming_pairs(spark, sf_dir).take(1)
    assert not [
        c
        for c in caught
        if issubclass(c.category, scale_hints.ChunkSpaceHint)
    ]


# ------------------------- scale-hint hardening (round-11 advice)


def test_warn_if_window_heavy_requires_a_sizing_source():
    """No known_rows, no df, no table_path -> a clear ValueError, not
    an AttributeError from df.count() on None."""
    with pytest.raises(ValueError, match="sizing source"):
        scale_hints.warn_if_window_heavy("op", "twin")


def test_scale_hint_env_is_read_at_call_time(monkeypatch):
    """SPARK_GRAFT_SCALE_HINT_ROWS set AFTER import must take effect
    (the round-11 advice: it was read once at module import)."""
    monkeypatch.setenv("SPARK_GRAFT_SCALE_HINT_ROWS", "0")
    # limit 0 disables: returns None without touching the (absent) df
    assert (
        scale_hints.warn_if_window_heavy("op", "twin", known_rows=10**12)
        is None
    )
    monkeypatch.setenv("SPARK_GRAFT_SCALE_HINT_ROWS", "5")
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        scale_hints.warn_if_window_heavy("op", "twin", known_rows=6)
    assert [
        c
        for c in caught
        if issubclass(c.category, scale_hints.WindowScaleHint)
    ]


def test_footer_short_circuit_skips_the_spark_probe(sf_dir):
    """A table whose footer row count is at or under the limit must
    short-circuit WITHOUT a Spark job: passing df=None alongside
    table_path proves no probe ran (it would raise otherwise)."""
    out = scale_hints.warn_if_window_heavy(
        "op",
        "twin",
        table_path=f"{sf_dir}/documents.parquet",
        threshold=10**9,
    )
    assert out is None  # skipped: footer bound <= limit, no Spark job


def test_footer_used_as_global_window_size(sf_dir):
    """Above the limit with no df, the footer count itself sizes a
    global window and the hint fires."""
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        n = scale_hints.warn_if_window_heavy(
            "op",
            "twin",
            table_path=f"{sf_dir}/documents.parquet",
            threshold=1,
        )
    assert n and n > 1
    assert [
        c
        for c in caught
        if issubclass(c.category, scale_hints.WindowScaleHint)
    ]


# ------------------------- sustained-contention liveness (VERDICT 5)


def test_sustained_contention_all_land_bounded_retries(spark, tmp_path):
    """Throughput/liveness pin for the conflict matrix under SUSTAINED
    contention: 6 writer threads x 5 commits each (4 blind appenders
    on fresh key ranges + 2 mergers on disjoint file sets), racing on
    one table with nothing monkeypatched. Every commit must land
    exactly once (30 versions over the seeds), no writer may exhaust
    its rebase budget, and the total number of lost version races
    (ConcurrentWriteError raised by _commit, retried internally) must
    stay under the theoretical ceiling of (threads-1) x commits — the
    fair-progress bound. The measured wall and commits/sec feed
    PERF.md's 1000-writer story."""
    import threading
    import time

    import trace_parquet_spark.sources.tablelog as tl
    from trace_parquet_spark.sources.tablelog import (
        append,
        latest_version,
        merge_upsert,
        read_table,
    )
    from pyspark.sql import functions as F

    def _kv(lo, hi, v):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), F.lit(v).alias("v")
        )

    t = str(tmp_path / "t")
    for lo in (0, 100, 200, 300):
        append(_kv(lo, lo + 10, 1).coalesce(1), t, stats_col="k")

    M = 5
    races = {"n": 0}
    race_lock = threading.Lock()
    real_commit = tl._commit

    def counting_commit(table, version, actions):
        try:
            return real_commit(table, version, actions)
        except tl.ConcurrentWriteError:
            with race_lock:
                races["n"] += 1
            raise

    tl._commit = counting_commit
    errs: list = []

    def appender(i):
        try:
            for j in range(M):
                base = 10_000 + 1_000 * i + 10 * j
                tl.append(_kv(base, base + 5, 2), t, stats_col="k")
        except Exception as e:  # noqa: BLE001 - collected for the assert
            errs.append(e)

    def merger(lo):
        try:
            for j in range(M):
                merge_upsert(
                    spark, t, _kv(lo + 2, lo + 6, 100 + j), "k"
                )
        except Exception as e:  # noqa: BLE001 - collected for the assert
            errs.append(e)

    try:
        ths = [
            threading.Thread(target=appender, args=(i,)) for i in range(4)
        ]
        ths += [threading.Thread(target=merger, args=(lo,)) for lo in (0, 100)]
        t0 = time.perf_counter()
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        wall = time.perf_counter() - t0
    finally:
        tl._commit = real_commit

    n_commits = 6 * M
    assert errs == [], f"writers failed under contention: {errs[:3]}"
    assert latest_version(t) == 3 + n_commits  # 4 seeds + 30, no gaps
    # fair-progress ceiling: each lost race implies someone else
    # landed; a commit can lose to at most the 5 other threads
    assert races["n"] <= (6 - 1) * n_commits, (
        f"{races['n']} lost version races for {n_commits} commits"
    )
    assert wall < 300, f"contention run took {wall:.0f}s"
    # contents: last-writer-wins within each merger's own sequence,
    # appended rows all present
    rows = {r.k: r.v for r in read_table(spark, t).collect()}
    for lo in (0, 100):
        for k in range(lo + 2, lo + 6):
            assert rows[k] == 100 + M - 1
    for i in range(4):
        for j in range(M):
            base = 10_000 + 1_000 * i + 10 * j
            for k in range(base, base + 5):
                assert rows[k] == 2
    print(
        f"\nsustained-contention: {n_commits} commits in {wall:.1f}s "
        f"({n_commits / wall:.2f} commits/s), {races['n']} lost races"
    )


# ------------------------- unigram-LM trainer replay (round 12)


def test_unigram_lm_train_matches_pure_python_replay(spark, sf_dir):
    """Independent pure-Python replay of the Viterbi hard-EM trainer
    (seed substring counts -> micro-nat costs -> per-word DP with the
    (cost, backpointer) tie-break -> backtrace -> Laplace recount,
    ULM_EM_ROUNDS times) must reproduce unigram_lm_train's model
    EXACTLY — the same discipline bpe_train_merges is pinned with."""
    import math
    import re
    from collections import Counter

    from trace_parquet_spark.operators.packing import (
        ULM_EM_ROUNDS,
        ULM_MAX_PIECE,
        ULM_MAX_WORD,
        unigram_lm_train,
    )

    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    wf = Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            if 1 <= len(w) <= ULM_MAX_WORD:
                wf[w] += 1

    def costs_from(counts):
        tot = sum(counts.values())
        return {
            p: math.floor(math.log(float(tot) / float(n)) * 1e6 + 0.5)
            for p, n in counts.items()
        }

    seed = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for l in range(1, min(ULM_MAX_PIECE, len(w) - i) + 1):
                seed[w[i : i + l]] += f
    cost = costs_from(seed)
    counts = dict(seed)
    chars = {c for w in wf for c in w}

    for _ in range(ULM_EM_ROUNDS):
        usage = Counter()
        for w, f in wf.items():
            L = len(w)
            best = {0: (0, None, None)}  # pos -> (cost, j, piece)
            for i in range(1, L + 1):
                cands = []
                for l in range(1, ULM_MAX_PIECE + 1):
                    j = i - l
                    if j < 0 or j not in best:
                        continue
                    p = w[j:i]
                    if p in cost:
                        cands.append((best[j][0] + cost[p], j, p))
                if cands:
                    best[i] = min(cands)  # (cost, j) lexicographic min
            pos = L
            while pos > 0:
                _, j, p = best[pos]
                usage[p] += f
                pos = j
        counts = {c: usage.get(c, 0) + 1 for c in chars}
        counts.update(
            {p: n for p, n in usage.items() if len(p) >= 2 and n > 0}
        )
        cost = costs_from(counts)

    want = sorted(
        ((p, counts[p], cost[p]) for p in counts),
        key=lambda r: (-r[1], r[0]),
    )
    got = [
        (r.piece, r.usage, r.cost_micro)
        for r in unigram_lm_train(spark, sf_dir).collect()
    ]
    assert got == want
