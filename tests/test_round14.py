"""Round-14 pins: the VACUUM + snapshot-retention lifecycle registry
entry, the tokenizer-trainer oracle's empty-vocabulary contract (the
Zipf-corpus parity axis caught the FROM-less scalar-subquery oracle
emitting phantom NULL rows where the engine loop correctly stops),
and the alphabetic-Zipf fixture mode that makes the tokenizer family
non-vacuous under a fat-head distribution."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F


# ------------------------- vacuum + retention lifecycle entry


def test_tablelog_vacuum_retention_phases(spark, sf_dir):
    """The four phases agree with direct recomputation, and the
    entry's internal asserts (vacuum removes exactly the orphan
    stage, expiry deletes exactly v0+v1's files, expired versions
    raise) all held — the function raising would fail this test."""
    from trace_parquet_spark.sources.tablelog import (
        tablelog_vacuum_retention_totals,
    )

    rows = tablelog_vacuum_retention_totals(spark, sf_dir).collect()
    assert [r.phase for r in rows] == [0, 1, 2, 3]
    base = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .filter((F.col("o_orderkey") % 8).isin(0, 5))
        .select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )

    def totals(mods):
        r = (
            base.filter((F.col("o_orderkey") % 3).isin(*mods))
            .agg(F.count("*").cast("long"), F.sum("cents").cast("long"))
            .collect()[0]
        )
        return (r[0], r[1])

    head = totals([2])
    assert (rows[0].n_orders, rows[0].total_cents) == head
    assert (rows[1].n_orders, rows[1].total_cents) == totals([0, 1])
    # retention must not change the head read, and the checkpoint
    # read of the earliest kept version must equal it too
    assert (rows[2].n_orders, rows[2].total_cents) == head
    assert (rows[3].n_orders, rows[3].total_cents) == head


def test_vacuum_retention_registered_with_oracle():
    import __spark_entry__ as e

    assert "tablelog_vacuum_retention_totals" in e.queries()
    assert "tablelog_vacuum_retention_totals" in e.oracle_sql()


# ------------------------- trainer-oracle empty-vocabulary contract


def _empty_vocab_duck():
    """An in-memory documents table whose tokens have NO multi-char
    [a-z]+ words — the shape the w<digits> Zipf corpus exposes."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(0, 'w12 w9 w4431 w0 w1', 'en', 'src0', 18), "
        "(1, 'w7 w7 w21 w100', 'en', 'src1', 14)"
        ") AS t(doc_id, text, lang, source, n_chars)"
    )
    return con


def test_bpe_train_oracle_empty_vocab_emits_zero_rows():
    """The unrolled BPE train oracle must emit ZERO rows when the
    corpus has no symbol pairs at all, matching the engine loop's
    first-round break — not one all-NULL row per round (the
    CORRECTNESS_zipf_r14 finding)."""
    from trace_parquet_spark.operators.packing import BPE_TRAIN_SQL

    assert _empty_vocab_duck().execute(BPE_TRAIN_SQL).fetchall() == []


def test_wordpiece_train_oracle_empty_vocab_emits_zero_rows():
    from trace_parquet_spark.operators.packing import WP_TRAIN_SQL

    assert _empty_vocab_duck().execute(WP_TRAIN_SQL).fetchall() == []


def test_wordpiece_apply_oracle_empty_vocab_single_letters():
    """With zero learned merges the apply oracle's vocabulary is the
    26 single letters: every 1-char token is exactly one piece, so
    fertility is 1e6 ppm per word."""
    from trace_parquet_spark.operators.packing import WP_APPLY_SQL

    rows = _empty_vocab_duck().execute(WP_APPLY_SQL).fetchall()
    # tokens are all single 'w' chars -> every word 1 piece
    assert rows, "apply oracle must still emit per-source rows"
    for _source, n_words, n_pieces, fert_ppm in rows:
        assert n_words == n_pieces
        assert fert_ppm == 1_000_000


# ------------------------- alpha-Zipf fixture mode


def test_alpha_word_encoding_is_injective_and_alphabetic():
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "gen_sf",
        os.path.join(os.path.dirname(__file__), "..", "tools", "gen_sf.py"),
    )
    gen_sf = ilu.module_from_spec(spec)
    spec.loader.exec_module(gen_sf)
    words = [gen_sf._alpha_word(k) for k in range(30_000)]
    assert len(set(words)) == len(words)  # collision-free
    assert all(w.isalpha() and w.islower() and len(w) >= 2 for w in words)


# ------------------------- stream-static enrichment entry


def test_stream_static_enrich_join_holds_zero_state(spark, sf_dir):
    """The stream-static dimension join must contribute NO state
    operator — state is exactly the windowed agg's. The entry records
    per-operator peaks into STATE_PEAKS; a stream-stream join would
    surface as a second operator (symmetricHashJoin)."""
    from trace_parquet_spark.streaming import windowed_oracle as wo

    for k in list(wo.STATE_PEAKS):
        if k.startswith("stream_static_enrich_totals/"):
            del wo.STATE_PEAKS[k]
    out = wo.stream_static_enrich_totals(spark, sf_dir)
    assert out.count() > 0
    ops = {
        k.split("/", 1)[1]
        for k in wo.STATE_PEAKS
        if k.startswith("stream_static_enrich_totals/")
    }
    assert ops, "no state peaks recorded"
    assert all("join" not in o.lower() for o in ops), ops


def test_stream_static_enrich_registered_with_oracle():
    import __spark_entry__ as e

    assert "stream_static_enrich_totals" in e.queries()
    assert "stream_static_enrich_totals" in e.oracle_sql()


# ------------------------- domain reweighting (DoReMi-lite MW)


def test_domain_reweight_trajectory_invariants(spark, sf_dir):
    from trace_parquet_spark.operators.mixture import (
        MW_ROUNDS,
        _MW_W0,
        domain_reweight_mw,
    )

    rows = domain_reweight_mw(spark, sf_dir).collect()
    by_round: dict[int, list] = {}
    for r in rows:
        by_round.setdefault(r["round"], []).append(r)
    assert sorted(by_round) == list(range(MW_ROUNDS + 1))
    n_src = len(by_round[0])
    # round 0 is exactly uniform on the share-ppm grid
    assert all(r.weight_ppm == _MW_W0 // n_src for r in by_round[0])
    for t, rs in by_round.items():
        assert len(rs) == n_src
        assert all(r.weight_ppm > 0 for r in rs)
        total = sum(r.weight_ppm for r in rs)
        # weights renormalize to the 1e6 ppm grid each round, up to
        # one unit of truncation per source in each DIV layer
        assert _MW_W0 - 2 * n_src - 2 <= total <= _MW_W0 + n_src
    # the max-loss domain's share never falls below uniform: its
    # excess is >= 0 every round, so its multiplicative factor is
    # >= every other domain's
    max_loss_src = max(by_round[0], key=lambda r: (r.loss_micro, r.source)).source
    final = {r.source: r.weight_ppm for r in by_round[MW_ROUNDS]}
    assert final[max_loss_src] >= _MW_W0 // n_src - n_src


# ------------------------- curriculum ordering


def test_curriculum_phase_structure(spark, sf_dir):
    import importlib.util as ilu

    from trace_parquet_spark.operators.quality_rules import (
        curriculum_order_docs,
    )

    df = curriculum_order_docs(spark, sf_dir)
    rows = df.collect()
    n_docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    )
    assert len(rows) == n_docs  # every doc is scheduled exactly once
    # higher score => earlier (lower-or-equal) phase; best band = 0
    by_score = {}
    for r in rows:
        by_score.setdefault(r.score, set()).add(r.phase)
    for s, phases in by_score.items():
        assert len(phases) == 1  # ties share a phase by construction
    ordered = sorted(by_score.items(), key=lambda kv: -kv[0])
    assert next(iter(ordered[0][1])) == 0
    ph = [next(iter(p)) for _, p in ordered]
    assert ph == sorted(ph)  # monotone: lower score never earlier

    # the only global window rides the bounded score grid — the
    # structural audit must agree
    spec = ilu.spec_from_file_location(
        "window_audit",
        os.path.join(
            os.path.dirname(__file__), "..", "tools", "window_audit.py"
        ),
    )
    wa = ilu.module_from_spec(spec)
    spec.loader.exec_module(wa)
    assert wa.global_window_violations(df) == []


# ------------------------- streaming CDC merge entry


def test_stream_merge_latest_version_wins(spark, sf_dir):
    """Final table = global max-version row per key (files ascend in
    version; order_col collapses within-batch duplicates), and the
    replay raise-check inside the entry pins exactly-once."""
    from trace_parquet_spark.sources.tablelog_source import (
        tablelog_stream_merge_totals,
    )

    rows = tablelog_stream_merge_totals(spark, sf_dir).collect()
    assert rows
    ks = [r.k for r in rows]
    assert len(ks) == len(set(ks))  # exactly one surviving row per key
    base = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .filter((F.col("o_orderkey") % 8).isin(1, 4))
        .groupBy((F.col("o_orderkey") % 500).alias("k"))
        .agg(F.max("o_orderkey").alias("version"))
        .collect()
    )
    expect = {r.k: r.version for r in base}
    got = {r.k: r.version for r in rows}
    assert got == expect


def test_stream_merge_registered_with_oracle():
    import __spark_entry__ as e

    assert "tablelog_stream_merge_totals" in e.queries()
    assert "tablelog_stream_merge_totals" in e.oracle_sql()


# ------------------------- recursion backstop sizing (sf3 finding)


def test_dup_chain_closure_sizes_recursion_backstop(spark, sf_dir):
    """The 30x parity run caught Spark's 1M recursive-CTE row backstop
    tripping on a LINEAR closure (docs x K rows crosses 1M above
    ~10x). The entry must size the backstop from its own scale
    contract, materialize under the raised limit, and RESTORE the
    session conf afterwards."""
    from trace_parquet_spark.plans.recursive import dup_chain_closure

    key = "spark.sql.cteRecursionRowLimit"
    before = spark.conf.get(key)
    out = dup_chain_closure(spark, sf_dir)
    assert spark.conf.get(key) == before  # conf restored
    assert out.count() > 0  # materialized result survives the restore


# ------------------------- codegen class cache sizing (session 4)


def test_codegen_cache_sized_for_heavy_queries(spark):
    """A single heavy registry query generates 140-170 codegen units,
    so Spark's default 100-entry codegen class cache evicts EVERYTHING
    between repetitions (measured via CodegenMetrics: ~150 Janino
    compiles per rep at the default vs 14-18 once warm at 5000). The
    engine session must size the cache above one query's working set;
    this pins the conf so a session.py regression is caught."""
    assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 5000
