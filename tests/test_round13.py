"""Round-13 pins: the 128-bit SimHash combined-block rung (implements
the widening target the round-12 verdict found documented-but-absent),
the ChunkSpaceHint chaining simhash64 -> simhash128, and the round-12
advice fixes (empty-slice guard in the streaming windowed oracle, loud
warning on a malformed SPARK_GRAFT_CHUNK_HINT_FACTOR)."""

from __future__ import annotations

import warnings as w

import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.operators import scale_hints
from trace_parquet_spark.operators.dedup import (
    _PAIRS128,
    HAM128_CHUNKS,
    HAM128_MAX,
    simhash64_hamming_pairs,
    simhash128_docs,
    simhash128_hamming_pairs,
)


# ------------------------- 128-bit SimHash combined-block rung


def test_simhash128_signature_uses_both_words(spark, sf_dir):
    """Both BIGINT words must actually carry 64 populated bits each
    (including the sign bits) — a rung that silently recomputed the
    64-bit signature in sim_lo and left sim_hi degenerate would pass
    a pairs oracle while keeping the chunk space it exists to
    escape."""
    sims = simhash128_docs(spark, sf_dir)
    stats = sims.agg(
        F.count("*").alias("n"),
        # sign bits (bits 127 and 63) exercised in both directions —
        # SimHash bits are corpus-correlated (shared vocabulary skews
        # each bit's doc-fraction), so no 50/50 split is expected,
        # just non-degeneracy
        F.sum(F.when(F.col("sim_hi") < 0, 1).otherwise(0)).alias("hi_neg"),
        F.sum(F.when(F.col("sim_lo") < 0, 1).otherwise(0)).alias("lo_neg"),
        F.count_distinct("sim_hi").alias("hi_distinct"),
        F.count_distinct("sim_lo").alias("lo_distinct"),
        F.sum(
            F.when(
                F.shiftright(F.col("sim_hi"), 32).bitwiseAND((1 << 32) - 1)
                != 0,
                1,
            ).otherwise(0)
        ).alias("hi_upper"),
    ).first()
    assert stats.n > 0
    assert 0 < stats.hi_neg < stats.n
    assert 0 < stats.lo_neg < stats.n
    # near-dup corpus: ~2% duplicate docs collapse a few signatures
    assert stats.hi_distinct > stats.n * 0.9
    assert stats.lo_distinct > stats.n * 0.9
    assert stats.hi_upper > stats.n * 0.9


def test_simhash128_combined_block_recall_is_exact(spark, sf_dir):
    """The 28 chunk-pair keys must find EXACTLY the all-pairs
    ≤HAM128_MAX set (pigeonhole: 3 flips touch ≤3 of 8 chunks, so ≥5
    untouched chunks give ≥C(5,2)=10 matching pair keys). The driver
    oracle proves this vs DuckDB; this pin proves it in-engine
    against a Spark all-pairs derivation, so a blocking bug cannot
    hide behind a matching oracle bug."""
    sims = simhash128_docs(spark, sf_dir).collect()
    mask = (1 << 64) - 1
    expected = set()
    for i, ra in enumerate(sims):
        for rb in sims[i + 1 :]:
            x_hi = (ra.sim_hi ^ rb.sim_hi) & mask
            x_lo = (ra.sim_lo ^ rb.sim_lo) & mask
            if bin(x_hi).count("1") + bin(x_lo).count("1") <= HAM128_MAX:
                expected.add(
                    (min(ra.doc_id, rb.doc_id), max(ra.doc_id, rb.doc_id))
                )
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash128_hamming_pairs(spark, sf_dir).collect()
    }
    assert got == expected


def test_simhash128_key_geometry_supports_the_radius():
    """8 × 16 must cover all 128 bits, and pair keys only guarantee
    recall while at least TWO chunks survive the worst-case flips:
    HAM128_MAX ≤ CHUNKS − 2 (the single-chunk rungs only need −1)."""
    assert HAM128_CHUNKS * 16 == 128
    assert HAM128_MAX <= HAM128_CHUNKS - 2
    assert len(_PAIRS128) == HAM128_CHUNKS * (HAM128_CHUNKS - 1) // 2
    assert all(i < j for i, j in _PAIRS128)


def test_simhash64_hints_at_128bit_twin(spark, sf_dir, monkeypatch):
    """Past the chunk-space factor the 64-bit rung must emit a
    ChunkSpaceHint naming simhash128_hamming_pairs; at the default
    factor it stays silent at test SF (500 docs ≪ 32×65,536)."""
    monkeypatch.setenv("SPARK_GRAFT_CHUNK_HINT_FACTOR", "0")
    # factor 0 disables entirely — also silent
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        simhash64_hamming_pairs(spark, sf_dir).take(1)
    assert not [
        c for c in caught if issubclass(c.category, scale_hints.ChunkSpaceHint)
    ]
    # 16-bit chunk space: 500 docs can't exceed factor×65,536 for any
    # factor ≥ 1, so drive the threshold under the corpus via a
    # negative... factors ≤0 disable; instead shrink with factor=1 on
    # a synthetic n_docs through the helper directly
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        scale_hints.warn_if_chunk_space_saturated(
            "simhash64_hamming_pairs",
            "simhash128_hamming_pairs",
            chunk_space=2**16,
            n_docs=2**16 * 32 + 1,
            factor=32,
        )
    hints = [
        c for c in caught if issubclass(c.category, scale_hints.ChunkSpaceHint)
    ]
    assert hints, "64-bit rung's threshold emitted no ChunkSpaceHint"
    assert "simhash128_hamming_pairs" in str(hints[0].message)
    monkeypatch.delenv("SPARK_GRAFT_CHUNK_HINT_FACTOR")
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        simhash64_hamming_pairs(spark, sf_dir).take(1)
    assert not [
        c for c in caught if issubclass(c.category, scale_hints.ChunkSpaceHint)
    ]


# ------------------------- round-12 advice fixes


def test_malformed_chunk_hint_factor_warns(monkeypatch):
    """A non-integer SPARK_GRAFT_CHUNK_HINT_FACTOR must produce the
    same UserWarning _current_limit gives a malformed
    SPARK_GRAFT_SCALE_HINT_ROWS — not a silent default fallback."""
    monkeypatch.setenv("SPARK_GRAFT_CHUNK_HINT_FACTOR", "not-an-int")
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        scale_hints.warn_if_chunk_space_saturated(
            "op", "twin", chunk_space=256, n_docs=1
        )
    msgs = [
        c
        for c in caught
        if issubclass(c.category, UserWarning)
        and "SPARK_GRAFT_CHUNK_HINT_FACTOR" in str(c.message)
    ]
    assert msgs, "malformed factor fell back silently"


def test_stream_window_finalize_empty_slice_returns_empty(
    spark, sf_dir, tmp_path
):
    """An events slice with zero view/click rows must yield an empty
    result with the contract schema — not int(None) deep in the
    quartile-cut arithmetic (round-12 advice)."""
    from trace_parquet_spark.sources.registry import load_table
    from trace_parquet_spark.streaming.windowed_oracle import (
        stream_window_finalize_totals,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "no-such-type"
    )
    out_dir = str(tmp_path / "empty_sf")
    ev.coalesce(1).write.parquet(f"{out_dir}/events.parquet")
    res = stream_window_finalize_totals(spark, out_dir)
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == [
        "window_start",
        "event_type",
        "n",
    ]


# ------------------------- stream-stream band join under the oracle


def test_stream_band_join_finalize_shape_and_band(spark, sf_dir):
    """The oracle proves value parity (check_oracle, all three SFs);
    this pin proves the STRUCTURAL contract in-engine: both matched
    and watermark-finalized null-padded rows exist, every matched row
    respects the band, and null-padding is all-or-nothing per row."""
    from trace_parquet_spark.streaming.band_join_oracle import (
        HORIZON_MS,
        stream_band_join_finalize,
    )

    rows = stream_band_join_finalize(spark, sf_dir).collect()
    assert rows, "empty result at test SF"
    matched = [r for r in rows if r.click_id is not None]
    padded = [r for r in rows if r.click_id is None]
    assert matched, "no matched pairs at test SF"
    assert padded, "no watermark-finalized null-padded purchases"
    for r in matched:
        assert r.click_ts is not None
        delta_ms = (
            r.purchase_ts - r.click_ts
        ).total_seconds() * 1000
        assert 0 <= delta_ms <= HORIZON_MS
    for r in padded:
        assert r.click_ts is None
        assert r.purchase_id is not None and r.purchase_ts is not None


# ------------------------- 16-writer contention + mid-race checkpoints
# (round-13 VERDICT task 5: scale the r12 liveness pin toward the
# Delta story and prove a checkpoint landing mid-contention cannot
# orphan rebases)


def test_contention_16_writers_with_mid_race_checkpoints(
    spark, tmp_path, monkeypatch
):
    """16 writer threads x 5 commits (10 blind appenders on fresh key
    ranges + 6 mergers on disjoint file sets) racing on one table,
    with AUTO_CHECKPOINT_EVERY forced to 3 so auto-checkpoints land
    repeatedly DURING the race. Every commit must land exactly once,
    no writer may exhaust its rebase budget, lost version races stay
    under the fair-progress ceiling, checkpoints actually landed in
    the contended version range, and the checkpoint-based replay
    (read_table) agrees with both the expected contents and a
    time-travel read below the newest checkpoint (a checkpoint that
    orphaned a rebase or snapshotted a half-applied merge would break
    one of these)."""
    import threading
    import time

    import trace_parquet_spark.sources.tablelog as tl
    from pyspark.sql import functions as F

    def _kv(lo, hi, v):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), F.lit(v).alias("v")
        )

    t = str(tmp_path / "t16")
    seed_los = (0, 100, 200, 300, 400, 500)
    for lo in seed_los:
        tl.append(_kv(lo, lo + 10, 1).coalesce(1), t, stats_col="k")
    seed_v = tl.latest_version(t)

    monkeypatch.setattr(tl, "AUTO_CHECKPOINT_EVERY", 3)

    M = 5
    N_APP, N_MERGE = 10, 6
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

    monkeypatch.setattr(tl, "_commit", counting_commit)
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
                tl.merge_upsert(spark, t, _kv(lo + 2, lo + 6, 100 + j), "k")
        except Exception as e:  # noqa: BLE001 - collected for the assert
            errs.append(e)

    ths = [threading.Thread(target=appender, args=(i,)) for i in range(N_APP)]
    ths += [
        threading.Thread(target=merger, args=(lo,)) for lo in seed_los
    ]
    t0 = time.perf_counter()
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    wall = time.perf_counter() - t0

    n_threads = N_APP + N_MERGE
    n_commits = n_threads * M
    assert errs == [], f"writers failed under contention: {errs[:3]}"
    assert tl.latest_version(t) == seed_v + n_commits  # no gaps, none lost
    assert races["n"] <= (n_threads - 1) * n_commits, (
        f"{races['n']} lost version races for {n_commits} commits"
    )
    assert wall < 480, f"contention run took {wall:.0f}s"

    # checkpoints landed DURING the race (not only at the seed edge)
    cps = tl._checkpoints(t)
    mid = [v for v in cps if seed_v < v <= seed_v + n_commits]
    assert mid, f"no auto-checkpoint landed in the contended range {cps}"

    # contents via the checkpoint-accelerated replay: last-writer-wins
    # within each merger's own sequence, appended rows all present
    rows = {r.k: r.v for r in tl.read_table(spark, t).collect()}
    for lo in seed_los:
        for k in range(lo + 2, lo + 6):
            assert rows[k] == 100 + M - 1
    for i in range(N_APP):
        for j in range(M):
            base = 10_000 + 1_000 * i + 10 * j
            for k in range(base, base + 5):
                assert rows[k] == 2

    # time-travel below the newest checkpoint still replays cleanly
    # (checkpoints are a pure optimization; a mid-race one must not
    # make earlier versions unreadable)
    early = tl.read_table(spark, t, as_of=seed_v).count()
    assert early == len(seed_los) * 10

    print(
        f"\n16-writer contention: {n_commits} commits in {wall:.1f}s "
        f"({n_commits / wall:.2f} commits/s), {races['n']} lost races, "
        f"checkpoints at {mid}"
    )


# ------------------------- unigram-LM apply + backtrace-sever pins
#
# Round-13: unigram_lm_apply is the tokenizer family's "apply" half
# (BPE already has train+apply), and the per-step localCheckpoint of
# the backtrace frontier is the structural fix the width probe
# prescribed (chained bt joins OOMed a 24 GiB driver at MAX_WORD=16
# during Catalyst canonicalization). These pins use a tiny handmade
# corpus so three full EM trainings stay test-cheap.


def _tiny_corpus(spark, tmp_path, texts):
    rows = [
        (i, t, "en", ["web", "books"][i % 2], len(t))
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "ulm")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _replay_ulm(texts, rounds, max_word, max_piece, final_viterbi=False):
    """Pure-Python hard-EM replay (round-12 discipline), optionally
    returning the final-model segmentation piece counts per word."""
    import math
    import re
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            if 1 <= len(w) <= max_word:
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
            for l in range(1, min(max_piece, len(w) - i) + 1):
                seed[w[i : i + l]] += f
    cost = costs_from(seed)
    counts = dict(seed)
    chars = {c for w in wf for c in w}

    def viterbi_pieces(w):
        L = len(w)
        best = {0: (0, None, None)}
        for i in range(1, L + 1):
            cands = []
            for l in range(1, max_piece + 1):
                j = i - l
                if j < 0 or j not in best:
                    continue
                p = w[j:i]
                if p in cost:
                    cands.append((best[j][0] + cost[p], j, p))
            if cands:
                best[i] = min(cands)
        out = []
        pos = L
        while pos > 0:
            _, j, p = best[pos]
            out.append(p)
            pos = j
        return out

    for _ in range(rounds):
        usage = Counter()
        for w, f in wf.items():
            for p in viterbi_pieces(w):
                usage[p] += f
        counts = {c: usage.get(c, 0) + 1 for c in chars}
        counts.update(
            {p: n for p, n in usage.items() if len(p) >= 2 and n > 0}
        )
        cost = costs_from(counts)

    if not final_viterbi:
        return counts, cost, wf
    return counts, cost, wf, {w: len(viterbi_pieces(w)) for w in wf}


TINY_TEXTS = [
    "the data table holds the data rows",
    "a fast scan beats a slow scan",
    "big data joins big data",
    "the window sorts the stream",
    "a hash join beats a sort merge join",
    "slow rows slow the fast scan",
]


def test_unigram_apply_matches_pure_python_replay(spark, tmp_path):
    """unigram_lm_apply's per-source fertility must match an
    independent pure-Python replay (train -> final Viterbi -> piece
    counts -> per-source DIV-ppm aggregation) EXACTLY."""
    import re

    from trace_parquet_spark.operators.packing import (
        ULM_EM_ROUNDS,
        ULM_MAX_PIECE,
        ULM_MAX_WORD,
        unigram_lm_apply,
    )

    d = _tiny_corpus(spark, tmp_path, TINY_TEXTS)
    _, _, _, wpieces = _replay_ulm(
        TINY_TEXTS, ULM_EM_ROUNDS, ULM_MAX_WORD, ULM_MAX_PIECE,
        final_viterbi=True,
    )

    want = {}
    for i, t in enumerate(TINY_TEXTS):
        src = ["web", "books"][i % 2]
        for w in re.findall("[a-z]+", t.lower()):
            if 1 <= len(w) <= ULM_MAX_WORD:
                nw, np = want.get(src, (0, 0))
                want[src] = (nw + 1, np + wpieces[w])
    expect = sorted(
        (s, nw, np, (np * 1_000_000) // nw)
        for s, (nw, np) in want.items()
    )

    got = [
        (r.source, r.n_words, r.n_pieces, r.fert_ppm)
        for r in unigram_lm_apply(spark, d).collect()
    ]
    assert got == expect


def test_unigram_width_beyond_longest_word_is_invariant(
    spark, tmp_path, monkeypatch
):
    """With every corpus word ≤ 8 chars, MAX_WORD=14 must train the
    IDENTICAL model (the DP and backtrace early-break on the first
    empty frontier, so the extra frames are never even planned —
    this is the regression pin for the per-step backtrace sever)."""
    from trace_parquet_spark.operators import packing

    d = _tiny_corpus(spark, tmp_path, TINY_TEXTS)
    base = [
        (r.piece, r.usage, r.cost_micro)
        for r in packing.unigram_lm_train(spark, d).collect()
    ]
    monkeypatch.setattr(packing, "ULM_MAX_WORD", 14)
    wide = [
        (r.piece, r.usage, r.cost_micro)
        for r in packing.unigram_lm_train(spark, d).collect()
    ]
    assert wide == base


def test_unigram_train_handles_long_words_at_width_12(
    spark, tmp_path, monkeypatch
):
    """The regime the old backtrace could not reach: words LONGER
    than 8 chars actually trained (MAX_WORD=12, non-empty deep
    frames). The plan must build and the model must match the
    pure-Python replay at the same width."""
    from trace_parquet_spark.operators import packing

    texts = TINY_TEXTS + [
        "partitioning partitioning checkpointed",
        "watermarked micropatches checkpointed",
    ]
    d = _tiny_corpus(spark, tmp_path, texts)
    monkeypatch.setattr(packing, "ULM_MAX_WORD", 12)
    counts, cost, _ = _replay_ulm(
        texts, packing.ULM_EM_ROUNDS, 12, packing.ULM_MAX_PIECE
    )
    want = sorted(
        ((p, counts[p], cost[p]) for p in counts),
        key=lambda r: (-r[1], r[0]),
    )
    got = [
        (r.piece, r.usage, r.cost_micro)
        for r in packing.unigram_lm_train(spark, d).collect()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# WordPiece trainer (round 13): pure-Python replay + criterion pin
# ---------------------------------------------------------------------------


def _python_wordpiece_train(word_freqs, rounds):
    """Reference WordPiece trainer (Schuster & Nakajima 2012):
    per round, merge the adjacent pair maximizing the exact integer
    likelihood score (n_pair * 1e18) // (n_left * n_right); ties ->
    higher raw count, then smallest pair. Sentinel rewriting matches
    the engine's greedy left-to-right str.replace exactly."""
    import collections

    base = 0xE000
    scale = 10**18
    vocab = dict(word_freqs)
    expansions: list[str] = []
    merges: list[tuple[int, str, int, int]] = []
    for r in range(rounds):
        pair_n: collections.Counter[str] = collections.Counter()
        sym_n: collections.Counter[str] = collections.Counter()
        for s, f in vocab.items():
            for c in s:
                sym_n[c] += f
            for i in range(len(s) - 1):
                pair_n[s[i : i + 2]] += f
        if not pair_n:
            break
        scored = {
            p: (n * scale) // (sym_n[p[0]] * sym_n[p[1]])
            for p, n in pair_n.items()
        }
        best = min(
            pair_n, key=lambda p: (-scored[p], -pair_n[p], p)
        )
        expanded = "".join(
            expansions[ord(c) - base] if ord(c) >= base else c for c in best
        )
        expansions.append(expanded)
        merges.append((r + 1, expanded, int(pair_n[best]), int(scored[best])))
        sent = chr(base + r)
        nxt: dict[str, int] = {}
        for s, f in vocab.items():
            ns = s.replace(best, sent)
            nxt[ns] = nxt.get(ns, 0) + f
        vocab = nxt
    return merges


def test_wordpiece_train_matches_python_replay(spark, sf_dir):
    import duckdb

    from tests.conftest import SF_DIR
    from tests.test_round8 import _python_bpe_train
    from trace_parquet_spark.operators.packing import (
        WP_TRAIN_ROUNDS,
        wordpiece_train_merges,
    )

    con = duckdb.connect()
    wf = con.execute(
        f"""
        WITH words AS (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
          FROM read_parquet('{SF_DIR}/documents.parquet')
        )
        SELECT w, count(*) AS f FROM words WHERE length(w) >= 2 GROUP BY w
        """
    ).fetchall()
    freqs = {w: f for w, f in wf}
    expected = _python_wordpiece_train(freqs, WP_TRAIN_ROUNDS)

    got = [
        (r["rank"], r["pair"], r["n"], r["score_e18"])
        for r in wordpiece_train_merges(spark, sf_dir).collect()
    ]
    assert got == expected
    # the likelihood criterion must bite: the merge SEQUENCE differs
    # from BPE's raw-count argmax on the same corpus (otherwise the
    # entry would just re-pin bpe_train_merges)
    bpe = [p for _, p, _ in _python_bpe_train(freqs, WP_TRAIN_ROUNDS)]
    assert [p for _, p, _, _ in expected] != bpe
    # score is a proper probability-ratio bound: n <= min(na, nb)
    # implies score_e18 <= 1e18
    assert all(s <= 10**18 for _, _, _, s in got)


# ---------------------------------------------------------------------------
# Kneser-Ney bigram smoothing (round 13): exact-rational replay +
# normalization property
# ---------------------------------------------------------------------------


def test_kneser_ney_bigram_matches_rational_replay(spark, sf_dir):
    """Replay interpolated KN in exact fractions.Fraction arithmetic
    from the raw token stream, check the engine's integer-ppm top-k
    against it, and pin the PROBABILITY-MODEL property that justifies
    the smoothing: for every history w1, summing P(w2|w1) over the
    full vocabulary (observed bigrams via the discounted term +
    continuation backoff for ALL words) is exactly 1."""
    from fractions import Fraction

    import duckdb

    from tests.conftest import SF_DIR
    from trace_parquet_spark.operators.hygiene import (
        KN_TOPK,
        kneser_ney_bigram_topk,
    )

    con = duckdb.connect()
    toks_per_doc = con.execute(
        rf"""
        SELECT string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')
        FROM read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id
        """
    ).fetchall()
    import collections

    c_bi: collections.Counter = collections.Counter()
    for (toks,) in toks_per_doc:
        toks = [t for t in toks]
        for a, b in zip(toks, toks[1:]):
            if a and b:
                c_bi[(a, b)] += 1
    c1 = collections.Counter()
    n1fw = collections.Counter()
    ncont = collections.Counter()
    for (a, b), n in c_bi.items():
        c1[a] += n
        n1fw[a] += 1
        ncont[b] += 1
    t = len(c_bi)
    d = Fraction(3, 4)

    def pkn(a, b):
        return (c_bi[(a, b)] - d) / c1[a] + d * n1fw[a] / c1[a] * Fraction(
            ncont[b], t
        )

    expected = sorted(
        (
            (a, b, c_bi[(a, b)], int(pkn(a, b) * 1_000_000))
            for (a, b) in c_bi
        ),
        key=lambda r: (-r[3], r[0], r[1]),
    )[:KN_TOPK]

    got = [
        (r["w1"], r["w2"], r["c12"], r["pkn_ppm"])
        for r in kneser_ney_bigram_topk(spark, sf_dir).collect()
    ]
    assert got == expected

    # normalization: sum over the FULL vocab of the interpolated model
    # is exactly 1 for every observed history
    vocab = set(ncont)
    for a in list(c1)[:20]:
        total = sum(
            (c_bi[(a, b)] - d) / c1[a] if (a, b) in c_bi else Fraction(0)
            for b in vocab
        ) + d * n1fw[a] / c1[a] * sum(Fraction(ncont[b], t) for b in vocab)
        assert total == 1, (a, total)

    # the continuation distribution must BITE: some top-k row ranks
    # differently than raw bigram frequency alone would (otherwise
    # this entry would collapse into top_tokens_exact territory)
    by_freq = sorted(
        ((a, b) for (a, b) in c_bi),
        key=lambda p: (-c_bi[p], p[0], p[1]),
    )[:KN_TOPK]
    assert [((a, b)) for a, b, _, _ in expected] != by_freq


# ---------------------------------------------------------------------------
# Perceptron distillation (round 13): pure-Python replay
# ---------------------------------------------------------------------------


def test_perceptron_distill_matches_python_replay(spark, sf_dir):
    """Replay the batch perceptron in plain Python from the raw
    feature relation (built via DuckDB with the exact oracle
    tokenization) and check the engine's mistake/weight trajectory
    row-for-row. Also pins that the model beats the zero-weight
    baseline: every post-round-1 mistake count is below round 1's
    everything-is-a-mistake count."""
    import duckdb

    from tests.conftest import SF_DIR
    from trace_parquet_spark.operators.quality_rules import (
        PERC_ROUNDS,
        perceptron_distill_train,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/documents.parquet')"
    )
    from trace_parquet_spark.operators.quality_rules import _perceptron_sql

    feats_sql = _perceptron_sql(1).split("wt0 AS")[0].rstrip().rstrip(",")
    rows = con.execute(
        feats_sql + "\nSELECT y, n_words, sum_wlen, n_sym, n_stop,"
        " top_bigram, n_bigrams FROM feats"
    ).fetchall()

    w = [0] * 7
    expected = []
    for r in range(PERC_ROUNDS):
        m, g = 0, [0] * 7
        for y, *x in rows:
            if y * (w[0] + sum(wj * xj for wj, xj in zip(w[1:], x))) <= 0:
                m += 1
                g[0] += y
                for j, xj in enumerate(x):
                    g[j + 1] += y * xj
        w = [wj + gj for wj, gj in zip(w, g)]
        expected.append((r + 1, m, *w))

    got = [tuple(r) for r in perceptron_distill_train(spark, sf_dir).collect()]
    assert got == expected
    assert all(r[1] < got[0][1] for r in got[1:]), got


# ---------------------------------------------------------------------------
# Streaming dedup oracle entry (round 13): bounded-state pin
# ---------------------------------------------------------------------------


def test_stream_dedup_state_is_bounded(spark, sf_dir, tmp_path):
    """The 25h-watermark eviction must BITE: across the availableNow
    run, the dedup state operator's numRowsTotal stays well below the
    total distinct-key count (an unbounded dropDuplicates would end
    holding every key). Also re-checks the emitted set equals batch
    DISTINCT on this run's own output."""
    import os

    from pyspark.sql import functions as F

    from trace_parquet_spark.sources.registry import load_table
    from trace_parquet_spark.streaming.windowed_oracle import (
        split_time_ordered,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    assert split_time_ordered(ev, src)

    out_rows = []

    def sink(bdf, bid):
        out_rows.extend(
            (r["user_id"], r["event_type"], r["day"]) for r in bdf.collect()
        )

    q = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select(
            "user_id", "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .withWatermark("day", "25 hours")
        .dropDuplicates(["user_id", "event_type", "day"])
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "availableNow run timed out"

    expected = {
        (r["user_id"], r["event_type"], r["day"])
        for r in ev.select(
            "user_id", "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .distinct()
        .collect()
    }
    assert set(out_rows) == expected
    assert len(out_rows) == len(expected), "a key re-emitted"

    state_rows = [
        op["numRowsTotal"]
        for p in q.recentProgress
        for op in p["stateOperators"]
        if op.get("operatorName") == "dedupe"
    ]
    assert state_rows, "no dedupe state operator in progress"
    # eviction bites: peak state is far below the full key count
    assert max(state_rows) < 0.6 * len(expected), (
        max(state_rows),
        len(expected),
    )


# ---------------------------------------------------------------------------
# WordPiece apply (round 13): greedy longest-match replay
# ---------------------------------------------------------------------------


def test_wordpiece_apply_matches_greedy_replay(spark, sf_dir):
    """Replay greedy longest-match segmentation in pure Python under
    the replayed trainer's vocabulary and check the per-source
    fertility rows exactly; also pins that the merged pieces BITE
    (fertility strictly below the all-singles baseline of
    1e6 ppm * mean word length / 1)."""
    import duckdb

    from tests.conftest import SF_DIR
    from tests.test_round13 import _python_wordpiece_train
    from trace_parquet_spark.operators.packing import (
        WP_APPLY_MAX_WORD,
        WP_TRAIN_ROUNDS,
        wordpiece_apply_merges,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM read_parquet('{SF_DIR}/documents.parquet')
        """
    ).fetchall()
    freqs: dict[str, int] = {}
    for _, w in rows:
        if len(w) >= 2:
            freqs[w] = freqs.get(w, 0) + 1
    merges = [p for _, p, _, _ in _python_wordpiece_train(freqs, WP_TRAIN_ROUNDS)]
    pieces = set(merges) | {chr(c) for c in range(97, 123)}

    def n_pieces(w: str) -> int:
        pos, np_ = 0, 0
        while pos < len(w):
            ln = max(
                (k for k in range(1, len(w) - pos + 1) if w[pos : pos + k] in pieces),
                default=0,
            )
            if ln == 0:
                break
            pos += ln
            np_ += 1
        return np_

    agg: dict[str, list[int]] = {}
    for src, w in rows:
        if 1 <= len(w) <= WP_APPLY_MAX_WORD:
            a = agg.setdefault(src, [0, 0])
            a[0] += 1
            a[1] += n_pieces(w)
    expected = [
        (src, nw, np_, (np_ * 1_000_000) // nw)
        for src, (nw, np_) in sorted(agg.items())
    ]

    got = [tuple(r) for r in wordpiece_apply_merges(spark, sf_dir).collect()]
    assert got == expected
    # merges bite: fewer pieces than characters for every source
    tot_chars = {}
    for src, w in rows:
        if 1 <= len(w) <= WP_APPLY_MAX_WORD:
            tot_chars[src] = tot_chars.get(src, 0) + len(w)
    assert all(np_ < tot_chars[src] for src, _, np_, _ in got)


# ---------------------------------------------------------------------------
# applyInPandasWithState session closure (round 13): both close paths fire
# ---------------------------------------------------------------------------


def test_stream_session_close_exercises_both_paths(spark, sf_dir):
    """The emitted session set must contain BOTH close paths: sessions
    with a later session for the same user (data-driven close: the
    successor event landed in some batch) and last-of-user sessions
    (only a watermark TIMEOUT can have emitted those — if the timeout
    machinery silently never fired, exactly these rows vanish)."""
    from trace_parquet_spark.streaming.stateful_oracle import (
        stream_session_close_stateful,
    )

    rows = stream_session_close_stateful(spark, sf_dir).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    last_starts = {u: max(r["start_us"] for r in rs) for u, rs in by_user.items()}
    timeout_closed = [
        r for r in rows if r["start_us"] == last_starts[r["user_id"]]
    ]
    data_closed = [
        r for r in rows if r["start_us"] != last_starts[r["user_id"]]
    ]
    assert timeout_closed, "no timeout-closed sessions emitted"
    assert data_closed, "no data-closed sessions emitted"
    # sessions are internally gap-consistent and non-overlapping
    for u, rs in by_user.items():
        rs = sorted(rs, key=lambda r: r["start_us"])
        for a, b in zip(rs, rs[1:]):
            assert a["end_us"] < b["start_us"]
        for r in rs:
            assert r["start_us"] <= r["end_us"] and r["n_events"] >= 1


def _protobuf_ok() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_ok(),
    reason="transformWithState driver worker needs google.protobuf "
    "(broken in this image; same block as test_streaming_rocksdb)",
)
def test_stream_session_close_tws_matches_oracle(spark, sf_dir):
    """When protobuf works, the Spark-4 TWS implementation must land
    on the SAME oracle as the applyInPandasWithState entry."""
    import duckdb

    from tests.conftest import SF_DIR
    from trace_parquet_spark.streaming.stateful_oracle import (
        STREAM_SESSION_CLOSE_SQL,
        stream_session_close_tws,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/events.parquet')"
    )
    expected = con.execute(STREAM_SESSION_CLOSE_SQL).fetchall()
    got = [
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in stream_session_close_tws(spark, sf_dir).collect()
    ]
    assert got == [tuple(r) for r in expected]
