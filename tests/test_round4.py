"""Round-4 additions: integer PageRank, the explicit Bloom-style
prefilter join, TPC-DS-shaped rollup-rank / channel-union queries, and
the time-to-convert funnel percentiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from trace_parquet_spark.plans.ds_shapes import (
    TOPK,
    channel_union_rollup,
    rollup_rank_mfgr_brand,
)
from trace_parquet_spark.plans.funnels import time_to_convert
from trace_parquet_spark.plans.graph_rank import (
    ITERS,
    SCALE,
    pagerank_trade_graph,
)
from trace_parquet_spark.plans.join_strategies import bloom_prefilter_join
from trace_parquet_spark.sources.registry import load_table


def test_pagerank_mass_conserved_and_positive(spark, sf_dir):
    rows = pagerank_trade_graph(spark, sf_dir).collect()
    nation_n = load_table(spark, sf_dir, "nation").count()
    assert len(rows) == nation_n
    total = sum(r.rank_scaled for r in rows)
    # truncating divisions and dangling nations only ever lose mass;
    # the final iteration's teleport term alone guarantees 15% of SCALE
    # even if every nation dangled.
    assert 0.15 * SCALE * 0.99 <= total <= SCALE
    assert all(r.rank_scaled > 0 for r in rows)
    # descending output order
    ranks = [r.rank_scaled for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_bloom_prefilter_equals_plain_join(spark, sf_dir):
    got = {
        r.l_returnflag: (r.n_items, r.revenue)
        for r in bloom_prefilter_join(spark, sf_dir).collect()
    }
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") == 1996)
        )
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {r.l_returnflag: r.n for r in plain} == {
        k: v[0] for k, v in got.items()
    }


def test_bloom_prefilter_plan_broadcasts_bucket_set(spark, sf_dir):
    plan = bloom_prefilter_join(spark, sf_dir)._jdf.queryExecution().toString()
    assert "LeftSemi" in plan and "Broadcast" in plan


def test_rollup_rank_levels_and_bounds(spark, sf_dir):
    rows = rollup_rank_mfgr_brand(spark, sf_dir).collect()
    assert all(1 <= r.rk <= TOPK for r in rows)
    # grand-total row: all-NULL dims, alone in its partition -> rank 1
    grand = [r for r in rows if r.p_mfgr is None]
    assert len(grand) == 1 and grand[0].rk == 1 and grand[0].p_brand is None
    # within each mfgr the subtotal (brand NULL) dominates every brand
    for r in rows:
        if r.p_mfgr is not None and r.p_brand is None:
            assert r.rk == 1
    # ranks are dense-start: every mfgr partition has a rank-1 row
    mfgrs = {r.p_mfgr for r in rows if r.p_mfgr is not None}
    for m in mfgrs:
        assert min(r.rk for r in rows if r.p_mfgr == m) == 1


def test_channel_union_counts_partition_events(spark, sf_dir):
    rows = channel_union_rollup(spark, sf_dir).collect()
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()
    assert {r.channel for r in rows} <= {"purchase", "signup", "other"}


def test_time_to_convert_deltas_positive(spark, sf_dir):
    rows = time_to_convert(spark, sf_dir).collect()
    for r in rows:
        assert r.n_converted > 0
        assert 0 <= r.median_s <= r.p90_s


def test_heavy_hitter_candidates_bounded_and_complete(spark, sf_dir):
    from trace_parquet_spark.functions.text import tokens
    from trace_parquet_spark.operators.heavy_hitters import (
        CAPACITY,
        TOPK,
        _mg_sketch,
        top_tokens_exact,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("token")).filter(
        F.col("token") != ""
    )
    n_parts = toks.rdd.getNumPartitions()
    cands = set(
        r.token
        for r in toks.mapInPandas(_mg_sketch, schema="token string")
        .distinct()
        .collect()
    )
    assert len(cands) <= n_parts * CAPACITY
    exact = toks.groupBy("token").agg(F.count("*").alias("n")).collect()
    total = sum(r.n for r in exact)
    # MG guarantee: every token above N/CAPACITY must be a candidate
    for r in exact:
        if r.n > total / CAPACITY:
            assert r.token in cands
    # and the full query equals the plain exact top-k
    got = [(r.token, r.n) for r in top_tokens_exact(spark, sf_dir).collect()]
    want = sorted(((r.token, r.n) for r in exact), key=lambda t: (-t[1], t[0]))
    assert got == want[:TOPK]


def test_zorder_buckets_partition_rows_and_cluster_both_keys(spark, sf_dir):
    from trace_parquet_spark.operators.zorder import (
        BITS,
        BUCKET_BITS,
        zorder_layout_stats,
    )

    rows = zorder_layout_stats(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    assert sum(r.n_rows for r in rows) == li.count()
    assert all(0 <= r.bucket < (1 << BUCKET_BITS) for r in rows)
    # clustering: with 3 Morton prefix bits per dimension, each bucket
    # spans ~1/8 of each key range; assert well under the unclustered
    # full width on average for BOTH dimensions at once
    ok_lo, ok_hi, pk_lo, pk_hi = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    mean_ok = sum(r.max_orderkey - r.min_orderkey for r in rows) / len(rows)
    mean_pk = sum(r.max_partkey - r.min_partkey for r in rows) / len(rows)
    assert mean_ok <= (ok_hi - ok_lo) / 4
    assert mean_pk <= (pk_hi - pk_lo) / 4


def test_entity_resolution_clusters_are_consistent(spark, sf_dir):
    from trace_parquet_spark.operators.entity_resolution import (
        resolve_part_entities,
    )

    rows = resolve_part_entities(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        members = [int(k) for k in r.member_keys.split("|")]
        assert r.n_members == len(members) >= 2
        assert r.canonical_key == min(members)
        assert not seen & set(members)  # clusters are disjoint
        seen |= set(members)


def test_decontaminate_flags_only_corpus_docs_with_shared_grams(spark, sf_dir):
    from trace_parquet_spark.functions.text import shingles_from, tokens
    from trace_parquet_spark.operators.hygiene import (
        EVAL_MOD,
        NGRAM,
        decontaminate_docs,
    )

    rows = decontaminate_docs(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    gram_rows = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles_from(tokens("text"), NGRAM))
        ).alias("gram"),
    ).collect()
    eval_grams = {r.gram for r in gram_rows if r.doc_id % EVAL_MOD == 0}
    by_doc = {}
    for r in gram_rows:
        if r.doc_id % EVAL_MOD != 0:
            by_doc.setdefault(r.doc_id, set()).add(r.gram)
    expected = {
        d: len(g & eval_grams) for d, g in by_doc.items() if g & eval_grams
    }
    got = {r.doc_id: r.n_hit_grams for r in rows}
    assert got == expected
    assert all(d % EVAL_MOD != 0 for d in got)


def test_surprisal_covers_corpus_and_is_positive(spark, sf_dir):
    from trace_parquet_spark.functions.text import tokens
    from trace_parquet_spark.operators.hygiene import doc_surprisal

    rows = doc_surprisal(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    tok_total = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    assert sum(r.n_tokens for r in rows) == tok_total
    # surprisal ln(N/n) >= 0, and bounded by ln N
    import math

    for r in rows:
        assert 0 <= r.avg_surprisal <= math.log(tok_total) + 1e-6


def test_path_pattern_users_really_match(spark, sf_dir):
    from trace_parquet_spark.plans.sequences import (
        PATH_PATTERN,
        path_pattern_match,
    )
    import re

    rows = path_pattern_match(spark, sf_dir).collect()
    assert rows, "pattern should match someone at any sf"
    for r in rows:
        assert re.search(PATH_PATTERN, r.path)
        assert len(r.path) == r.n_events


def test_transition_matrix_rows_and_probs(spark, sf_dir):
    from trace_parquet_spark.plans.sequences import event_transition_matrix

    rows = event_transition_matrix(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_steps = ev.count() - ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_steps
    from collections import defaultdict

    by_src = defaultdict(float)
    for r in rows:
        assert 0 < r.p <= 1
        by_src[r.src_type] += r.p
    for s, tot in by_src.items():
        assert abs(tot - 1.0) < 1e-9


def test_cascade_forget_counts_match_anti_join(spark, sf_dir):
    from trace_parquet_spark.operators.forget import (
        FORGET_MOD,
        cascade_forget_audit,
    )

    got = {
        r.table_name: r.n_rows_deleted
        for r in cascade_forget_audit(spark, sf_dir).collect()
    }
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    doomed_c = cust.filter(F.col("c_custkey") % FORGET_MOD == 0)
    n_o_before = orders.count()
    survivors_o = orders.join(
        doomed_c, orders.o_custkey == doomed_c.c_custkey, "left_anti"
    )
    assert got["customer"] == doomed_c.count()
    assert got["orders"] == n_o_before - survivors_o.count()
    n_l_before = li.count()
    survivors_l = li.join(
        survivors_o.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    assert got["lineitem"] == n_l_before - survivors_l.count()


def test_mixture_sample_hits_target_shares(spark, sf_dir):
    from trace_parquet_spark.operators.mixture import (
        MILLE,
        mixture_sample_docs,
    )

    rows = mixture_sample_docs(spark, sf_dir).collect()
    assert rows
    total_kept = sum(r.n_kept for r in rows)
    assert total_kept > 0
    for r in rows:
        assert 0 <= r.thresh_millis <= MILLE
        assert r.n_kept <= r.n_input
        # expected share: w_s/W; kept/total should approximate it.
        # hash acceptance is binomial-ish — allow generous slack at
        # tiny sf, exactness is the oracle's job
        w = (int(r.source[3:]) % 4) + 1
    ws = {r.source: (int(r.source[3:]) % 4) + 1 for r in rows}
    big_w = sum(ws.values())
    for r in rows:
        target = ws[r.source] / big_w
        achieved = r.n_kept / total_kept
        assert abs(achieved - target) < 0.5 * target + 0.05


def test_concurrency_bounds(spark, sf_dir):
    from trace_parquet_spark.plans.temporal import max_daily_concurrency

    rows = max_daily_concurrency(spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    daily_users = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    )
    cap = {r.day: r.n for r in daily_users}
    for r in rows:
        assert 1 <= r.peak_concurrency <= cap[r.day.date()]


def test_multi_band_counts_partition_filtered_rows(spark, sf_dir):
    from trace_parquet_spark.plans.ds_shapes import BANDS, multi_band_counts

    row = multi_band_counts(spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    n_eligible = li.filter(
        (F.col("l_discount") >= 0.05)
        & (F.col("l_quantity") >= BANDS[0][0])
        & (F.col("l_quantity") <= BANDS[-1][1])
    ).count()
    assert sum(row[f"band_{lo}_{hi}"] for lo, hi in BANDS) == n_eligible


def test_gopher_flags_agree_with_python_recompute(spark, sf_dir):
    import re as _re

    from trace_parquet_spark.operators.quality_rules import (
        MAX_SYMBOL_MILLE,
        MAX_TOP_BIGRAM_MILLE,
        MIN_MWL,
        MAX_MWL,
        MIN_STOPWORDS,
        MIN_WORDS,
        MAX_WORDS,
        gopher_quality_flags,
    )
    from trace_parquet_spark.functions.text import STOPWORDS

    rows = gopher_quality_flags(spark, sf_dir).collect()
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert len(rows) == len(texts)
    n_pass = 0
    for r in rows[:100]:
        text = texts[r.doc_id]
        toks = _re.sub(r"\s+", " ", text.strip().lower()).split(" ")
        n_words = len(toks)
        assert r.n_words == n_words
        assert r.wc_ok == (MIN_WORDS <= n_words <= MAX_WORDS)
        sum_wlen = sum(len(t) for t in toks)
        assert r.mwl_ok == (
            MIN_MWL * n_words <= sum_wlen <= MAX_MWL * n_words
        )
        n_sym = len(_re.sub(r"[a-zA-Z0-9 ]", "", text))
        assert r.sym_ok == (n_sym * 1000 <= MAX_SYMBOL_MILLE * len(text))
        assert r.stop_ok == (len(set(toks) & set(STOPWORDS)) >= MIN_STOPWORDS)
        bigrams = [
            " ".join(toks[i : i + 2]) for i in range(max(len(toks) - 1, 1))
        ]
        from collections import Counter

        top = max(Counter(bigrams).values())
        assert r.rep_ok == (top * 1000 <= MAX_TOP_BIGRAM_MILLE * len(bigrams))
        n_pass += bool(r.passes)
    assert any(r.passes for r in rows) and not all(r.passes for r in rows)


def test_star_cc_agrees_with_label_prop_and_survives_long_chains(spark, sf_dir):
    import pytest as _pytest

    from trace_parquet_spark.operators.dedup_clusters import (
        connected_components,
        connected_components_star,
    )

    cases = [
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)],
        [(10, 11), (11, 12), (20, 21)],
        [(5, 1), (5, 2), (5, 3), (5, 4)],   # star rooted off-min
        [(100, 50)],
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "src long, dst long")
        a = sorted(map(tuple, connected_components(df).collect()))
        b = sorted(map(tuple, connected_components_star(df).collect()))
        assert a == b, edges
    # diameter > cap: label-prop must refuse (it used to return wrong
    # labels silently); the star variant solves it within the same cap
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError):
        connected_components(chain)
    b = sorted(map(tuple, connected_components_star(chain).collect()))
    assert len(b) == 31 and all(c == 0 for _, c in b)


def test_compression_ratio_matches_python_gzip_golden(spark, sf_dir):
    import gzip as _gzip

    from trace_parquet_spark.operators.hygiene import (
        compression_ratio_detail,
        compression_ratio_docs,
    )

    rows = compression_ratio_detail(spark, sf_dir).collect()
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert rows
    import zlib as _zlib

    for r in rows[:200]:
        raw = texts[r.doc_id].encode("utf-8")
        gz = _gzip.compress(raw, mtime=0)
        assert r.n_bytes == len(raw)
        assert r.n_gz_bytes == len(gz)
        assert r.ratio_mille == len(gz) * 1000 // len(raw)
        # the in-row golden checksum must be the CRC of the exact bytes
        assert r.gz_crc32 == _zlib.crc32(gz)
    # the gated registry entry's flags all hold (oracle predicts 1s)
    gated = compression_ratio_docs(spark, sf_dir).collect()
    assert len(gated) == len(rows)
    assert all(g.roundtrip_ok == 1 and g.gz_bounded == 1 for g in gated)


def test_corr_matrix_matches_numpy(spark, sf_dir):
    import numpy as np

    from trace_parquet_spark.plans.statistics import corr_matrix_lineitem

    got = {
        (r.col_x, r.col_y): r.corr
        for r in corr_matrix_lineitem(spark, sf_dir).collect()
    }
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .toPandas()
    )
    # same grid quantization as the operator
    q = {
        "l_quantity": pdf.l_quantity.astype("int64"),
        "l_extendedprice": np.floor(pdf.l_extendedprice * 100 + 0.5),
        "l_discount": np.floor(pdf.l_discount * 100 + 0.5),
        "l_tax": np.floor(pdf.l_tax * 100 + 0.5),
    }
    for (cx, cy), v in got.items():
        want = np.corrcoef(q[cx], q[cy])[0, 1]
        assert abs(v - want) < 1e-9, (cx, cy, v, want)
    assert len(got) == 6


def test_int8_quantization_bounds_and_reconstruction(spark, sf_dir):
    import numpy as np

    from trace_parquet_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    rows = quantize_embeddings_int8(spark, sf_dir).collect()
    assert rows
    embs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    for r in rows[:100]:
        v = embs[r.vec_id]
        scale = np.abs(v).max()
        assert r.scale == scale
        q = np.floor(v * 127.0 / scale + 0.5)
        assert r.q_min >= -127 and r.q_max <= 127
        assert r.q_sum == int(q.sum())
        # reconstruction error bounded by half a quantization step
        recon = q * scale / 127.0
        assert np.abs(recon - v).max() <= scale / 127.0 / 2 + 1e-12


def test_token_budget_bpe_pieces_superset_of_words(spark, sf_dir):
    import re as _re

    from trace_parquet_spark.operators.text_analysis import (
        BPE_PIECE_RE_DUCK,
        token_budget_by_source,
    )

    rows = token_budget_by_source(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    assert sum(r.n_docs for r in rows) == len(docs)
    # python recompute on one source
    src = rows[0].source
    pieces = words = 0
    for d in docs:
        if d.source != src:
            continue
        pieces += len(_re.findall(BPE_PIECE_RE_DUCK, d.text))
        words += len([t for t in _re.sub(r"\s+", " ", d.text.strip().lower()).split(" ") if t])
    assert rows[0].total_bpe_pieces == pieces
    # BPE pieces split punctuation off, so never fewer than words
    assert rows[0].total_bpe_pieces >= rows[0].total_ws_tokens == words


def test_join_size_estimates_are_exact(spark, sf_dir):
    from trace_parquet_spark.plans.join_stats import join_size_estimates

    rows = {r.join_name: r for r in join_size_estimates(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    actual_fk = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert rows["lineitem_orders_fk"].est_out_rows == actual_fk
    ev = load_table(spark, sf_dir, "events").select("user_id")
    actual_self = ev.alias("a").join(
        ev.alias("b"), F.col("a.user_id") == F.col("b.user_id")
    ).count()
    assert rows["events_self_user"].est_out_rows == actual_self
    # the cautionary row: the self-join expands superlinearly (the
    # quadratic risk the df-cap protects against), while the FK join's
    # expansion ratio is exactly 1 (each lineitem matches one order)
    fk = rows["lineitem_orders_fk"]
    assert fk.est_out_rows == fk.left_rows_matched
    sh = rows["shingle_self_join"]
    assert sh.est_out_rows / sh.left_rows_matched > 1.5
    assert sh.hottest_key_rows > 1


def test_choose_join_strategy_decisions(spark, sf_dir):
    from trace_parquet_spark.plans.join_stats import choose_join_strategy

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    # small dim -> broadcast
    d = choose_join_strategy(li, orders, "k")
    assert d["strategy"] == "broadcast"
    assert d["est_out_rows"] == li.count()
    # same join with a tiny broadcast budget -> shuffle (FK join, no skew)
    d2 = choose_join_strategy(li, orders, "k", broadcast_max_rows=10)
    assert d2["strategy"] == "shuffle"
    # synthetic hot key -> salted
    hot = spark.range(10_000).select(F.lit(1).alias("k")).union(
        spark.range(100).select((F.col("id") % 50 + 2).alias("k"))
    )
    flat = spark.range(60).select((F.col("id")).alias("k"))
    d3 = choose_join_strategy(hot, flat, "k", broadcast_max_rows=10)
    assert d3["strategy"] == "salted"
    assert d3["hot_ratio"] > 20
