"""Round-5 additions: semantic dedup over embeddings, exact-grid
centroids + nearest-centroid assignment, concat-and-chunk context
packing, the BPE merge-count step, and incremental MinHash dedup."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
from pyspark.sql import functions as F

from trace_parquet_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    dedup_minhash_lsh,
)
from trace_parquet_spark.operators.incremental_dedup import (
    CUT_DEN,
    CUT_NUM,
    dedup_incremental_minhash,
)
from trace_parquet_spark.operators.packing import (
    BPE_PIECE_RE,
    CTX_TOKENS,
    MERGE_TOP_K,
    MICROBATCH_DOCS,
    N_WORKERS,
    SHARD_DOCS,
    bpe_top_merges,
    bpe_vocab_coverage,
    epoch_shuffle_microbatches,
    pack_contexts,
)
from trace_parquet_spark.operators.semantic import (
    MICRO,
    OUTLIER_FRACTION_DEN,
    SEM_MAX_ID,
    embedding_centroids_by_label,
    embedding_outlier_prune,
    nearest_centroid_assign,
    semantic_dedup_clusters,
)
from trace_parquet_spark.sources.registry import load_table


def test_semantic_dedup_cluster_invariants(spark, sf_dir):
    rows = semantic_dedup_clusters(spark, sf_dir).collect()
    n_vecs = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < SEM_MAX_ID)
        .count()
    )
    assert len(rows) == n_vecs
    by_cluster: dict[int, list] = {}
    for r in rows:
        assert r.cluster_id <= r.vec_id  # label is the component min
        assert r.kept == (1 if r.vec_id == r.cluster_id else 0)
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert all(m.cluster_size == len(members) for m in members)
        assert sum(m.kept for m in members) == 1  # one representative
        assert min(m.vec_id for m in members) == cid


def test_nearest_centroid_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {
        r.vec_id: (r.label, np.floor(np.array(r.embedding, dtype=np.float64) * MICRO + 0.5).astype(np.int64))
        for r in emb
    }
    sums: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    for lbl, v in vecs.values():
        sums[lbl] = sums.get(lbl, 0) + v
        counts[lbl] = counts.get(lbl, 0) + 1
    # exact integer truncating division, matched to the operator
    cents = {
        lbl: np.where(
            sums[lbl] >= 0,
            sums[lbl] // counts[lbl],
            -((-sums[lbl]) // counts[lbl]),
        )
        for lbl in sums
    }
    expected = Counter()
    for lbl, v in vecs.values():
        best = min(
            sorted(cents),
            key=lambda c: (int(((v - cents[c]) ** 2).sum()), c),
        )
        expected[(lbl, best)] += 1
    got = {
        (r.true_label, r.assigned_label): r.n_vecs
        for r in nearest_centroid_assign(spark, sf_dir).collect()
    }
    assert got == dict(expected)
    # centroids table is K x dim
    cent_rows = embedding_centroids_by_label(spark, sf_dir).collect()
    dim = len(emb[0].embedding)
    assert len(cent_rows) == len(sums) * dim


def test_pack_contexts_token_conservation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    pat = re.compile(BPE_PIECE_RE)
    shard_tokens: dict[int, int] = {}
    for r in docs:
        n = len(pat.findall(r.text))
        if n > 0:
            shard = r.doc_id // SHARD_DOCS
            shard_tokens[shard] = shard_tokens.get(shard, 0) + n
    rows = pack_contexts(spark, sf_dir).collect()
    got_tokens: dict[int, int] = {}
    last_ctx = {}
    for r in rows:
        got_tokens[r.shard] = got_tokens.get(r.shard, 0) + r.n_tokens
        last_ctx[r.shard] = max(last_ctx.get(r.shard, -1), r.ctx)
        assert 1 <= r.n_tokens <= CTX_TOKENS
        assert r.n_docs_started <= r.n_docs
    assert got_tokens == shard_tokens
    # every context except each shard's last is exactly full
    for r in rows:
        if r.ctx < last_ctx[r.shard]:
            assert r.n_tokens == CTX_TOKENS
    # contexts are dense 0..last per shard
    per_shard = Counter(r.shard for r in rows)
    for shard, n in per_shard.items():
        assert n == last_ctx[shard] + 1


def test_bpe_top_merges_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    freq: Counter = Counter()
    for r in docs:
        for w in re.findall("[a-z]+", r.text.lower()):
            if len(w) >= 2:
                freq[w] += 1
    pair_counts: Counter = Counter()
    for w, f in freq.items():
        for i in range(len(w) - 1):
            pair_counts[w[i : i + 2]] += f
    expected = sorted(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        :MERGE_TOP_K
    ]
    got = [
        (r.pair, r.n) for r in bpe_top_merges(spark, sf_dir).collect()
    ]
    assert got == expected


def test_incremental_minhash_is_restriction_of_full(spark, sf_dir):
    """The incremental pairs are exactly the full-LSH pairs that cross
    the history/delta cutoff — same signatures, same verification."""
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    max_id = load_table(spark, sf_dir, "documents").agg(
        F.max("doc_id")
    ).collect()[0][0]
    cut = (max_id + 1) * CUT_NUM // CUT_DEN
    expected = {
        (a, b): j for (a, b), j in full.items() if a < cut and b >= cut
    }
    got = {
        (r.dup_of, r.doc_new): r.jaccard
        for r in dedup_incremental_minhash(spark, sf_dir).collect()
    }
    assert got == expected
    for (a, b), j in got.items():
        assert j >= JACCARD_THRESHOLD


def test_outlier_prune_counts_and_monotone_rank(spark, sf_dir):
    rows = embedding_outlier_prune(spark, sf_dir).collect()
    per_label = Counter(
        r.label for r in load_table(spark, sf_dir, "embeddings").collect()
    )
    got_per_label = Counter(r.label for r in rows)
    for lbl, n in per_label.items():
        assert got_per_label.get(lbl, 0) == n // OUTLIER_FRACTION_DEN
    # within a label, rank 1 is the farthest; d2 non-increasing by rank
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    for members in by_label.values():
        members.sort(key=lambda r: r.dist_rank)
        d2s = [r.d2 for r in members]
        assert d2s == sorted(d2s, reverse=True)
        assert [r.dist_rank for r in members] == list(
            range(1, len(members) + 1)
        )


def test_epoch_shuffle_partitions_all_docs(spark, sf_dir):
    rows = epoch_shuffle_microbatches(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    pat = re.compile(BPE_PIECE_RE)
    assert sum(r.n_docs for r in rows) == len(docs)
    assert sum(r.n_tokens for r in rows) == sum(
        len(pat.findall(d.text)) for d in docs
    )
    # every microbatch except the raggedy last few (worker tails) is full
    full = [r for r in rows if r.microbatch < (len(docs) // MICROBATCH_DOCS) - N_WORKERS]
    assert all(r.n_docs == MICROBATCH_DOCS for r in full)


def test_vocab_coverage_bounds(spark, sf_dir):
    row = bpe_vocab_coverage(spark, sf_dir).collect()[0]
    assert 0 < row.covered_pairs <= row.total_pairs
    assert 0 < row.coverage_micro <= 1_000_000
    top = bpe_top_merges(spark, sf_dir).collect()
    assert sum(r.n for r in top) == row.covered_pairs


def test_pit_features_no_leakage(spark, sf_dir):
    """Brute-force replay: each purchase's features must equal the
    strictly-before-7d counts — never including the label second."""
    from trace_parquet_spark.operators.feature_store import (
        LOOKBACK_S,
        pit_features_7d,
    )
    from trace_parquet_spark.sources.registry import load_table as lt

    ev = [
        (
            r.event_id,
            r.user_id,
            r.event_type,
            int(np.floor(r.value * 100 + 0.5)),
            int(r.ts.timestamp()),
        )
        for r in lt(spark, sf_dir, "events").collect()
    ]
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e[1], []).append(e)
    expected = {}
    for e in ev:
        if e[2] != "purchase":
            continue
        t = e[4]
        past = [
            x
            for x in by_user[e[1]]
            if t - LOOKBACK_S <= x[4] <= t - 1
        ]
        expected[e[0]] = (
            sum(1 for x in past if x[2] == "view"),
            sum(1 for x in past if x[2] == "click"),
            sum(x[3] for x in past if x[2] == "view"),
        )
    got = {
        r.event_id: (r.n_views_7d, r.n_clicks_7d, r.view_cents_7d)
        for r in pit_features_7d(spark, sf_dir).collect()
    }
    assert got == expected


def test_source_overlap_matrix_bounds(spark, sf_dir):
    from trace_parquet_spark.operators.provenance import source_overlap_matrix

    rows = source_overlap_matrix(spark, sf_dir).collect()
    sources = {
        r.source for r in load_table(spark, sf_dir, "documents").select("source").distinct().collect()
    }
    n = len(sources)
    assert len(rows) <= n * (n - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b
        assert r.n_shared >= 1
        assert 0 < r.jaccard_micro <= 1_000_000


def test_length_bucket_padding_identity(spark, sf_dir):
    from trace_parquet_spark.operators.packing import (
        BUCKET_STEP,
        length_bucket_padding,
    )

    docs = load_table(spark, sf_dir, "documents").collect()
    pat = re.compile(BPE_PIECE_RE)
    toks = [len(pat.findall(d.text)) for d in docs]
    toks = [t for t in toks if t > 0]
    rows = length_bucket_padding(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == len(toks)
    assert sum(r.n_tokens for r in rows) == sum(toks)
    for r in rows:
        assert r.bucket_len % BUCKET_STEP == 0
        assert r.n_tokens <= r.n_padded == r.bucket_len * r.n_docs
        assert 0 <= r.waste_micro < 1_000_000
        # every doc in the bucket fits and wouldn't fit one step down
        assert r.n_tokens > (r.bucket_len - BUCKET_STEP) * r.n_docs


def test_corpus_clean_semantic_is_clean_minus_semantic_drops(spark, sf_dir):
    from trace_parquet_spark.operators.corpus_pipeline import (
        corpus_clean,
        corpus_clean_semantic,
    )

    base = {r.doc_id for r in corpus_clean(spark, sf_dir).collect()}
    sem = semantic_dedup_clusters(spark, sf_dir).collect()
    dropped = {r.vec_id for r in sem if r.kept == 0}
    got = {r.doc_id for r in corpus_clean_semantic(spark, sf_dir).collect()}
    assert got == base - dropped


def test_semantic_lsh_refines_exact_clusters(spark, sf_dir):
    """LSH-candidate dedup may only SPLIT exact clusters (missed
    pairs), never merge them; kept count is therefore >= exact's."""
    from trace_parquet_spark.operators.semantic import semantic_dedup_lsh

    exact = {
        r.vec_id: r.cluster_id
        for r in semantic_dedup_clusters(spark, sf_dir).collect()
    }
    lsh_rows = semantic_dedup_lsh(spark, sf_dir).collect()
    lsh = {r.vec_id: r.cluster_id for r in lsh_rows}
    assert set(lsh) == set(exact)
    # refinement: two vectors in one LSH cluster are in one exact cluster
    by_lsh: dict[int, set] = {}
    for v, c in lsh.items():
        by_lsh.setdefault(c, set()).add(exact[v])
    for members in by_lsh.values():
        assert len(members) == 1
    n_kept_exact = sum(
        1 for r in semantic_dedup_clusters(spark, sf_dir).collect() if r.kept
    )
    assert sum(r.kept for r in lsh_rows) >= n_kept_exact


def test_hard_negatives_cross_label_and_sorted(spark, sf_dir):
    from trace_parquet_spark.operators.semantic import (
        HN_TOP,
        hard_negative_mining,
    )

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    rows = hard_negative_mining(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert labels[r.vec_id] == r.neg_label != labels[r.query_id]
        by_q.setdefault(r.query_id, []).append(r)
    for q, members in by_q.items():
        members.sort(key=lambda r: r.neg_rank)
        assert len(members) == HN_TOP
        cosines = [r.cosine for r in members]
        assert cosines == sorted(cosines, reverse=True)


def test_knn_vote_counts_partition_vectors(spark, sf_dir):
    from trace_parquet_spark.operators.semantic import (
        KNN_MAX_ID,
        knn_label_vote,
    )

    rows = knn_label_vote(spark, sf_dir).collect()
    n = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < KNN_MAX_ID)
        .count()
    )
    assert sum(r.n_vecs for r in rows) == n
    assert all(0 <= r.n_correct <= r.n_vecs for r in rows)


def test_nearest_centroid_broadcasts_centroids(spark, sf_dir):
    plan = nearest_centroid_assign(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_round5_windows_are_partitioned(spark, sf_dir):
    """The packing/shuffle running sums must never plan a
    single-partition global window — the spec has to carry the shard
    or worker partition key."""
    plan = pack_contexts(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(shard" in plan
    plan = epoch_shuffle_microbatches(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(worker" in plan


def test_dataset_card_reconciles_with_dedup_exact(spark, sf_dir):
    from trace_parquet_spark.operators.dataset_card import (
        dataset_card_by_source,
    )
    from trace_parquet_spark.operators.dedup import dedup_exact

    card = dataset_card_by_source(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    assert sum(r.n_docs for r in card) == len(docs)
    assert sum(r.n_chars for r in card) == sum(len(d.text) for d in docs)
    # total exact-dup docs across sources == dedup_exact's copy excess
    dup_total = sum(r.n_copies - 1 for r in dedup_exact(spark, sf_dir).collect())
    # card dups are per-source; a cross-source duplicate pair is not
    # visible within either source, so the card total is a lower bound
    assert sum(r.n_exact_dup_docs for r in card) <= dup_total


def test_bpe_apply_matches_python_replay(spark, sf_dir):
    """bpe_apply_merges' corpus accounting must equal an independent
    Python replay: same word-frequency relation, same rank-ordered
    merges applied as sequential left-to-right non-overlapping
    replacements."""
    import re
    from collections import Counter

    from trace_parquet_spark.operators.packing import (
        MERGE_TOP_K,
        bpe_apply_merges,
        bpe_top_merges,
    )
    from trace_parquet_spark.sources.registry import load_table

    texts = [r.text for r in load_table(spark, sf_dir, "documents").collect()]
    wf = Counter(
        w for t in texts for w in re.findall("[a-z]+", t.lower()) if len(w) >= 2
    )
    merges = [r.pair for r in bpe_top_merges(spark, sf_dir).collect()]
    assert len(merges) == MERGE_TOP_K

    chars_total = sum(f * len(w) for w, f in wf.items())
    symbols_total = 0
    for w, f in wf.items():
        s = w
        for i, pair in enumerate(merges):
            s = s.replace(pair, chr(0xE000 + i))
        symbols_total += f * len(s)

    row = bpe_apply_merges(spark, sf_dir).collect()[0]
    assert row.n_distinct_words == len(wf)
    assert row.n_word_occurrences == sum(wf.values())
    assert row.chars_total == chars_total
    assert row.symbols_total == symbols_total
    assert row.compression_micro == symbols_total * 1_000_000 // chars_total
    assert row.symbols_total < row.chars_total  # merges actually fired
