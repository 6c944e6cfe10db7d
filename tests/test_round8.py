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


def test_zorder_optimize_prunes_box_queries(spark, sf_dir, tmp_path):
    """OPTIMIZE ZORDER must make 2-key box pruning effective: the
    hash-scattered seed layout overlaps every file, the z-clustered
    rewrite overlaps strictly fewer — and content is untouched."""
    from pyspark.sql import functions as F

    from trace_parquet_spark.sources.registry import load_table
    from trace_parquet_spark.sources import tablelog as tl

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 1)
        .select("l_orderkey", "l_partkey",
                F.col("l_quantity").cast("long").alias("qty"))
    )
    t = str(tmp_path / "ztab")
    tl.append(li.repartition(16, "l_partkey"), t, stats_col="l_orderkey")
    b = li.agg(
        F.min("l_orderkey").alias("olo"), F.max("l_orderkey").alias("ohi"),
        F.min("l_partkey").alias("plo"), F.max("l_partkey").alias("phi"),
    ).collect()[0]
    preds = {
        "l_orderkey": (b.olo + (b.ohi - b.olo) // 4,
                       b.olo + (b.ohi - b.olo) // 2),
        "l_partkey": (b.plo + (b.phi - b.plo) // 4,
                      b.plo + (b.phi - b.plo) // 2),
    }
    pre_files = tl.files_overlapping(t, preds)
    pre = tl.read_table_box(spark, t, preds).orderBy(
        "l_orderkey", "l_partkey", "qty"
    ).collect()

    res = tl.optimize_table_zorder(spark, t, 16, ("l_orderkey", "l_partkey"))
    assert res["files_before"] == 16

    post_files = tl.files_overlapping(t, preds)
    post = tl.read_table_box(spark, t, preds).orderBy(
        "l_orderkey", "l_partkey", "qty"
    ).collect()

    # identical reads pre/post — layout changed, content did not
    assert post == pre and len(pre) > 0
    # hash scatter ⇒ every file overlaps the box; zorder ⇒ strictly
    # fewer stats-overlapping files for the same 2-key predicate
    assert len(pre_files) == 16
    assert len(post_files) < len(pre_files), (pre_files, post_files)
    # the zorder commit recorded per-file ranges for BOTH keys
    cs = tl._col_stats_state(t, None)
    assert set(cs) == {"l_orderkey", "l_partkey"}
    live = tl._read_log(t, None)[0]
    assert all(f in cs["l_orderkey"] and f in cs["l_partkey"] for f in live)
    # plain full read agrees with the exact-filter path (pruning is
    # never a correctness dependency)
    full = (
        tl.read_table(spark, t)
        .filter(F.col("l_orderkey").between(*preds["l_orderkey"]))
        .filter(F.col("l_partkey").between(*preds["l_partkey"]))
        .orderBy("l_orderkey", "l_partkey", "qty")
        .collect()
    )
    assert full == post
    # col_stats survive checkpointing (expire keeps box pruning alive)
    tl.write_checkpoint(t)
    assert set(tl._col_stats_state(t, None)) == {"l_orderkey", "l_partkey"}
