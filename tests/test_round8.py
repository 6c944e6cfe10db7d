"""Round-8 additions: iterative BPE training replay pin."""

from __future__ import annotations

import collections

import duckdb

from tests.conftest import SF_DIR


def _python_bpe_train(word_freqs: dict[str, int], rounds: int):
    """Reference BPE trainer (Sennrich et al. 2016), dict-based: count
    adjacent symbol pairs weighted by word frequency, merge the most
    frequent (ties → smallest pair), re-segment, repeat. Symbols are
    single code points; merges rewrite to private-use sentinels so the
    greedy left-to-right ``str.replace`` matches the engine exactly."""
    base = 0xE000
    vocab = dict(word_freqs)
    expansions: list[str] = []
    merges: list[tuple[int, str, int]] = []
    for r in range(rounds):
        counts: collections.Counter[str] = collections.Counter()
        for s, f in vocab.items():
            for i in range(len(s) - 1):
                counts[s[i : i + 2]] += f
        if not counts:
            break
        best, n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expanded = "".join(
            expansions[ord(c) - base] if ord(c) >= base else c for c in best
        )
        expansions.append(expanded)
        merges.append((r + 1, expanded, int(n)))
        sent = chr(base + r)
        nxt: dict[str, int] = {}
        for s, f in vocab.items():
            ns = s.replace(best, sent)
            nxt[ns] = nxt.get(ns, 0) + f
        vocab = nxt
    return merges


def test_bpe_train_merges_matches_python_replay(spark, sf_dir):
    from trace_parquet_spark.operators.packing import (
        N_TRAIN_ROUNDS,
        bpe_train_merges,
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
    expected = _python_bpe_train({w: f for w, f in wf}, N_TRAIN_ROUNDS)

    got = [
        (r["rank"], r["pair"], r["n"])
        for r in bpe_train_merges(spark, sf_dir).collect()
    ]
    assert got == expected
    # iteration is doing real work: later merges must build on earlier
    # merged symbols (an expansion longer than 2 chars is impossible
    # for the one-shot pair counter)
    assert any(len(p) > 2 for _, p, _ in got), got
