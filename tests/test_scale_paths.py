"""Scale-path mechanisms: salting correctness, bucketed joins being
Exchange-free, and the range-partitioned sorted sink (tested in
test_sources)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.operators.skew import salted_agg, salted_join
from trace_parquet_spark.sources.bucketing import bucketed_join, write_bucketed
from trace_parquet_spark.sources.registry import load_table


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: (r.n, round(r.qty, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    salted = salted_agg(
        li,
        "l_returnflag",
        aggs=[
            F.sum("n").alias("n"),
            F.sum("qty").alias("qty"),
        ],
        partial_aggs=[
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("qty"),
        ],
        buckets=8,
    )
    got = {r.l_returnflag: (r.n, round(r.qty, 2)) for r in salted.collect()}
    assert got == plain


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cust = cust.withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, "o_custkey").count()
    salted = salted_join(orders, cust, "o_custkey", buckets=4).count()
    assert salted == plain


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
        write_bucketed(li, "b_lineitem", ["o_orderkey"], 8, ["o_orderkey"])
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        # sanity: result matches the plain join
        assert joined.count() == load_table(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_aqe_coalesces_small_shuffle_partitions(spark, sf_dir):
    """AQE must shrink the 8 configured shuffle partitions down to the
    few the tiny exchange actually needs — the runtime re-plan that
    keeps task counts sane across 5 orders of magnitude of data."""
    from trace_parquet_spark.sources.registry import load_table

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .count()
    )
    df.collect()  # finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan


def test_bucket_pruning_on_filter(spark, sf_dir, tmp_path):
    """An equality filter on the bucketing key must scan 1 of 8 buckets
    (SelectedBucketsCount) — file-level pruning with no partition dirs."""
    from pyspark.sql import functions as F

    from trace_parquet_spark.sources.bucketing import write_bucketed
    from trace_parquet_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    try:
        # autoBucketedScan drops the bucketed layout when the planner
        # sees no join/agg on the bucket key — but filter pruning IS a
        # benefit, so pin it on for point-lookup scans
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        write_bucketed(orders, "bp_orders", ["o_custkey"], 8, ["o_custkey"])
        one_key = spark.table("bp_orders").filter(F.col("o_custkey") == 7)
        plan = one_key._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan
        expect = orders.filter(F.col("o_custkey") == 7).count()
        assert one_key.count() == expect
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP TABLE IF EXISTS bp_orders")


def test_aqe_splits_skewed_join(spark):
    """A hot-key join under AQE with skew thresholds forced low must
    show the skew-split in the final adaptive plan — the runtime half
    of the skew story (operators/skew.py salting is the planned
    half)."""
    import pyspark.sql.functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        # 100k rows on ONE key vs a flat right side
        left = spark.range(100_000).select(
            F.lit(7).alias("k"), F.col("id").alias("payload")
        ).union(
            spark.range(200).select(
                (F.col("id") % 40).alias("k"), F.col("id").alias("payload")
            )
        )
        right = spark.range(40).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        joined = left.join(right, "k")
        # collect() drives THIS Dataset's QueryExecution, so its
        # AdaptiveSparkPlan reaches isFinalPlan=true (count() would
        # plan and execute a different query)
        assert len(joined.collect()) == 100_000 + 200
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skewed" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is not None:
                conf.set(k, v)


def test_equi_depth_approx_no_single_partition(spark, sf_dir):
    """The approx twin exists to kill the exact version's global-ntile
    Exchange SinglePartition over the full orders table — its own plan
    must not reintroduce one at any stage."""
    from trace_parquet_spark.plans.analytics_more import (
        equi_depth_price_buckets_approx,
    )

    import re

    plan = (
        equi_depth_price_buckets_approx(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the exact twin's failure mode: a global Window moving every row
    # to one partition
    assert "Window" not in plan
    # any SinglePartition exchange must carry only partial-agg rows
    # (one per upstream partition — the benign global-scalar shape),
    # never the data itself
    for m in re.finditer(r"Exchange SinglePartition[^\n]*\n[^\n]*", plan):
        assert "partial_" in m.group(0), m.group(0)
    assert "BroadcastHashJoin" in plan  # the cell->bucket assignment


def test_equi_depth_approx_is_near_equi_depth(spark, sf_dir):
    """Bucket sizes must deviate from n/N_BUCKETS by at most the mass
    of one histogram cell (the sketch's documented error bound), and
    bucket spans must be ordered and non-overlapping."""
    from trace_parquet_spark.plans.analytics_more import (
        N_BUCKETS,
        equi_depth_price_buckets_approx,
    )

    rows = equi_depth_price_buckets_approx(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(1, N_BUCKETS + 1))
    n = sum(r.n_orders for r in rows)
    max_cell = max(r.n_orders for r in rows)  # cell mass <= bucket mass
    for r in rows:
        assert abs(r.n_orders - n / N_BUCKETS) <= max_cell
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_release_caches_empties_storage(spark, sf_dir):
    """Tracked intra-query caches must all be releasable: after
    release_caches() the context holds no persistent RDDs, so a
    sequential full-registry run cannot accumulate storage."""
    from trace_parquet_spark.operators.dedup import dedup_minhash_lsh
    from trace_parquet_spark.session import release_caches

    release_caches()  # start clean
    dedup_minhash_lsh(spark, sf_dir).count()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() > 0
    assert release_caches() > 0
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_corpus_clean_restriction_matches_post_filter(spark, sf_dir):
    """The survivor restriction pushed into the pair generator must
    commute with verification: restricted pairs == full pairs filtered
    afterwards."""
    from pyspark.sql import functions as F

    from trace_parquet_spark.operators.dedup import (
        _minhash_pairs,
        dedup_minhash_lsh,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 0)
        .select("doc_id")
    )
    restricted = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in _minhash_pairs(spark, sf_dir, restrict_ids=ids).collect()
    }
    full = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
        if r.doc_a % 2 == 0 and r.doc_b % 2 == 0
    }
    assert restricted == full


def test_setsim_prefix_exact_and_actually_prunes(spark, sf_dir):
    """The prefix-filter join must be EXACT (identical rows to the
    all-pairs ground truth — no recall loss, unlike LSH) while
    generating strictly fewer candidate pairs than the all-pairs
    space it replaces."""
    from trace_parquet_spark.operators.dedup import (
        SETSIM_DEN,
        SETSIM_NUM,
        SHINGLE_DF_CAP,
        _doc_shingles,
        dedup_ngram_pairs,
        dedup_setsim_prefix,
    )

    exact = {tuple(r) for r in dedup_ngram_pairs(spark, sf_dir).collect()}
    got = {tuple(r) for r in dedup_setsim_prefix(spark, sf_dir).collect()}
    assert got == exact and got

    # candidate volume: prefix-prefix collisions vs all doc pairs
    sh = _doc_shingles(spark, sf_dir)
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))
    hot = dfreq.filter(F.col("df") > SHINGLE_DF_CAP).select("s")
    capped = sh.join(hot, "s", "left_anti")
    sizes = capped.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    from pyspark.sql import Window as W

    prefix = (
        capped.join(dfreq, "s")
        .withColumn("pos", F.row_number().over(
            W.partitionBy("doc_id").orderBy("df", "s")))
        .join(sizes, "doc_id")
        .filter(F.col("pos") <= F.col("n_sh")
                - F.expr(f"(n_sh * {SETSIM_NUM} + {SETSIM_DEN} - 1)"
                         f" div {SETSIM_DEN}") + 1)
        .select("doc_id", "s")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    n_cand = (
        a.join(b, (F.col("a.s") == F.col("b.s"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select("a.doc_id", "b.doc_id").distinct().count()
    )
    n_docs = sizes.count()
    assert n_cand < n_docs * (n_docs - 1) // 2 / 10  # >10x pruning


def test_dedup_verification_semi_joins_survive_without_hints(spark, sf_dir):
    """Round-5 sweep: the forced F.broadcast hints on data-scaling
    candidate id-sets are gone, and the verification stage is
    restricted to candidate PAIRS before its aggregation. The pruning
    must survive hint removal: each plan still carries (a) the
    candidate-doc semi-join feeding the re-shingle and (b) the
    candidate-pair semi-join feeding the n_inter aggregate — Spark
    auto-broadcasts them below threshold locally, while at scale
    size/AQE picks the strategy instead of a forced driver collect."""
    from trace_parquet_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_setsim_prefix,
    )
    from trace_parquet_spark.operators.incremental_dedup import (
        dedup_incremental_minhash,
    )

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    for build in (dedup_minhash_lsh, dedup_setsim_prefix,
                  dedup_incremental_minhash):
        plan = plan_of(build(spark, sf_dir))
        # doc-prune semi-join + pair-restriction semi-join
        assert plan.count("LeftSemi") >= 2, build.__name__
        # no degenerate fallback to a cartesian verification
        assert "CartesianProduct" not in plan, build.__name__


def test_corpus_semantic_drop_antijoin_survives_without_hint(spark, sf_dir):
    """corpus_clean_semantic's sem_drop anti-join lost its forced
    broadcast (the drop-set scales with semantic-dup count); the
    anti-join itself must remain in the plan."""
    from trace_parquet_spark.operators.corpus_pipeline import (
        corpus_clean_semantic,
    )

    plan = (
        corpus_clean_semantic(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_salted_join_spreads_hot_keys_across_salt_buckets(spark, sf_dir):
    """With broadcast disabled (the regime salting exists for — a dim
    too big to broadcast), the salted join must shuffle on
    (key, __salt): each hot key's rows spread over `buckets` reducers
    instead of funneling through one."""
    from trace_parquet_spark.operators.skew import salted_join

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        dim = orders.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_in_priority")
        )
        joined = salted_join(orders, dim, "o_orderpriority", buckets=8)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        import re

        m = re.search(r"hashpartitioning\(o_orderpriority[^)]*__salt", plan)
        assert m, plan[:2000]
        # and the spread is real: distinct (key, salt) combos > keys
        from trace_parquet_spark.operators.skew import with_salt

        combos = (
            with_salt(orders, "o_orderpriority", 8)
            .select("o_orderpriority", "__salt")
            .distinct()
            .count()
        )
        assert combos > 5 * 4  # 5 hot keys spread over most of 8 salts
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_substring_spans_match_bruteforce_replay(spark, sf_dir):
    """dedup_substring_spans vs an independent pure-Python replay:
    collect the corpus, count K-gram occurrences with a dict, flag
    positions, merge runs — results must match exactly, and spans must
    be maximal (the windows just outside each span are NOT corpus-
    duplicated... unless adjacency merged them, which maximality
    already guarantees via the replay equality)."""
    from collections import Counter

    from trace_parquet_spark.functions.text import tokens
    from trace_parquet_spark.operators.dedup import (
        SPAN_K,
        dedup_substring_spans,
    )

    toks = {
        r.doc_id: r.tt
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("tt"))
        .collect()
    }
    counts = Counter()
    for tt in toks.values():
        for i in range(len(tt) - SPAN_K + 1):
            counts[" ".join(tt[i : i + SPAN_K])] += 1
    want = []
    for doc_id, tt in sorted(toks.items()):
        flagged = [
            i
            for i in range(len(tt) - SPAN_K + 1)
            if counts[" ".join(tt[i : i + SPAN_K])] >= 2
        ]
        run = []
        for p in flagged + [None]:
            if run and (p is None or p != run[-1] + 1):
                want.append((doc_id, run[0], run[-1] + SPAN_K,
                             run[-1] + SPAN_K - run[0]))
                run = []
            if p is not None:
                run.append(p)
    got = [tuple(r) for r in dedup_substring_spans(spark, sf_dir).collect()]
    assert got == sorted(want)
    assert got  # fixture contains real duplicated runs
    # spans are disjoint and well-formed per doc
    by_doc = {}
    for doc_id, s, e, n in got:
        assert e - s == n >= SPAN_K
        assert by_doc.get(doc_id, -1) < s
        by_doc[doc_id] = e


def test_substring_spans_plan_shape(spark, sf_dir):
    """Token-linear, pairing-free: no cartesian/nested-loop join
    anywhere, and the islands window is doc_id-partitioned (a global
    window would serialize the corpus through one task)."""
    from trace_parquet_spark.operators.dedup import dedup_substring_spans

    plan = (
        dedup_substring_spans(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "windowspecdefinition(doc_id" in plan  # per-doc, never global


def test_setsim_ppjoin_filters_inclusive_at_boundaries(spark, tmp_path):
    """Adversarial boundary corpus for the PPJoin prunes: pairs at
    EXACTLY J = τ — including one sitting on the length-filter
    boundary (min·den = max·num) — must be found (both filters are
    inclusive), and a pair just below τ must not. Engineered shingle
    sets: a shared 12-token run contributes exactly 10 shared 3-gram
    shingles; distinct 5-token heads keep junction shingles disjoint."""
    from trace_parquet_spark.operators.dedup import dedup_setsim_prefix

    def doc(head, shared):
        return " ".join(head + shared)

    s_run = [f"s{i}" for i in range(12)]      # 10 internal shingles
    s_run9 = [f"r{i}" for i in range(11)]     # 9 internal shingles
    rows = [
        # pair (0,1): |A|=|B|=15 shingles, 10 shared -> J = 10/20 = 0.5
        (0, doc([f"a{i}" for i in range(5)], s_run)),
        (1, doc([f"b{i}" for i in range(5)], s_run)),
        # pair (2,3): 9 shared of 14 each -> J = 9/19 < 0.5 (excluded)
        (2, doc([f"c{i}" for i in range(5)], s_run9)),
        (3, doc([f"d{i}" for i in range(5)], s_run9)),
        # pair (4,5): |A|=10 contained in |B|=20 -> J = 10/20 = 0.5,
        # sitting exactly on the length-filter boundary min*2 == max
        # (own token run, disjoint from s_run, so no cross-pairs)
        (4, " ".join(f"f{i}" for i in range(12))),
        (5, " ".join([f"f{i}" for i in range(12)] + [f"e{i}" for i in range(10)])),
    ]
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["t"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_setsim_prefix(spark, str(tmp_path)).collect()
    }
    assert set(got) == {(0, 1), (4, 5)}
    assert got[(0, 1)] == 0.5
    assert got[(4, 5)] == 0.5


def test_split_leakage_free_never_straddles_clusters(spark, sf_dir):
    """Every near-dup pair must land in ONE split (the guard's whole
    point), singletons keep their own doc_id as rep, and the bucket
    ratios are in the hash-uniform ballpark."""
    from trace_parquet_spark.operators.dedup import dedup_minhash_lsh
    from trace_parquet_spark.operators.dedup_clusters import (
        split_leakage_free,
    )

    rows = split_leakage_free(spark, sf_dir).collect()
    split_of = {r.doc_id: r.split for r in rows}
    pairs = dedup_minhash_lsh(spark, sf_dir).collect()
    assert pairs
    for p in pairs:
        assert split_of[p.doc_a] == split_of[p.doc_b], (p.doc_a, p.doc_b)
    # deterministic, total, and roughly 80/10/10
    from collections import Counter

    c = Counter(r.split for r in rows)
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]
    assert len(rows) == len(split_of)  # one row per doc


def test_lift_approx_no_single_partition_window(spark, sf_dir):
    """lift_table_deciles_approx exists to kill the exact version's
    global row_number over user grain (round-6 verdict item 2) — its
    plan must carry no WindowExec at all, and any SinglePartition
    exchange may move only partial-agg scalar rows, never data."""
    import re

    from trace_parquet_spark.plans.funnels import (
        lift_table_deciles,
        lift_table_deciles_approx,
    )

    plan = (
        lift_table_deciles_approx(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    for m in re.finditer(r"Exchange SinglePartition[^\n]*\n[^\n]*", plan):
        assert "partial_" in m.group(0), m.group(0)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

    # semantic gate vs the exact twin: same totals; per-decile counts
    # deviate by at most the largest tie group (the documented bound)
    exact = {r.decile: r for r in lift_table_deciles(spark, sf_dir).collect()}
    approx = {
        r.decile: r
        for r in lift_table_deciles_approx(spark, sf_dir).collect()
    }
    assert sum(r.n_users for r in exact.values()) == sum(
        r.n_users for r in approx.values()
    )
    assert sum(r.n_conv for r in exact.values()) == sum(
        r.n_conv for r in approx.values()
    )
    # the final decile's cumulative gain is 100% in both
    last = max(exact)
    assert exact[last].cum_gain_ppm == 1_000_000
    assert approx[max(approx)].cum_gain_ppm == 1_000_000


def test_scrub_duplicated_spans_matches_python_replay(spark, sf_dir):
    """The ExactSubstr APPLY step vs an independent pure-Python
    replay: removing every flagged position's token and hashing the
    re-joined remainder must reproduce cleaned_md5 exactly, and the
    kept/removed accounting must reconcile with the span relation."""
    import hashlib
    from collections import Counter

    from trace_parquet_spark.functions.text import tokens
    from trace_parquet_spark.operators.dedup import (
        SPAN_K,
        scrub_duplicated_spans,
    )

    toks = {
        r.doc_id: r.tt
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("tt"))
        .collect()
    }
    counts = Counter()
    for tt in toks.values():
        for i in range(len(tt) - SPAN_K + 1):
            counts[" ".join(tt[i : i + SPAN_K])] += 1
    got = {r.doc_id: r for r in scrub_duplicated_spans(spark, sf_dir).collect()}
    assert set(got) == set(toks)
    n_scrubbed = 0
    for doc_id, tt in toks.items():
        dead = set()
        for i in range(len(tt) - SPAN_K + 1):
            if counts[" ".join(tt[i : i + SPAN_K])] >= 2:
                dead.update(range(i, i + SPAN_K))
        kept = [t for i, t in enumerate(tt) if i not in dead]
        r = got[doc_id]
        assert r.n_tok == len(tt)
        assert r.kept_tok == len(kept)
        assert r.removed_tok == len(dead)
        expect_md5 = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert r.cleaned_md5 == expect_md5, doc_id
        n_scrubbed += bool(dead)
    assert n_scrubbed  # fixture contains real duplicated runs


def test_matryoshka_recall_sanity(spark, sf_dir):
    """The full-dimension row IS the ground truth (recall exactly 1e6);
    every prefix row's hits are bounded by the truth count; and the
    numbers match a numpy replay of the truncated-cosine ranking."""
    import numpy as np

    from trace_parquet_spark.operators.similarity import (
        MATRYOSHKA_DIMS,
        N_QUERIES,
        TOP_K,
        matryoshka_recall,
    )

    rows = {r.dim: r for r in matryoshka_recall(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(MATRYOSHKA_DIMS)
    full = rows[max(MATRYOSHKA_DIMS)]
    assert full.recall_micro == 1_000_000 and full.n_hits == full.n_truth
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def topk(d):
        out = set()
        for q in range(N_QUERIES):
            qv = emb[q][:d]
            scored = []
            for vid, v in emb.items():
                if vid == q:
                    continue
                c = float(qv @ v[:d] / (np.linalg.norm(qv) * np.linalg.norm(v[:d])))
                scored.append((-round(c, 9), vid))
            for _, vid in sorted(scored)[:TOP_K]:
                out.add((q, vid))
        return out

    truth = topk(max(MATRYOSHKA_DIMS))
    assert rows[8].n_truth == len(truth)
    for d in MATRYOSHKA_DIMS:
        assert rows[d].n_hits == len(topk(d) & truth), d
        assert 0 <= rows[d].recall_micro <= 1_000_000


def test_k_core_matches_python_peel(spark, sf_dir):
    """Coreness must match an independent pure-Python iterative peel
    on the same edge relation, and the cascade must matter somewhere
    (some node's coreness < a naive degree-threshold bound)."""
    from trace_parquet_spark.plans.graph_rank import (
        KCORE_KS,
        _sym_edges,
        k_core_decomposition,
    )

    edges = {(r.src, r.dst) for r in _sym_edges(spark, sf_dir).collect()}
    nodes = {r.node for r in
             load_table(spark, sf_dir, "nation")
             .selectExpr("CAST(n_nationkey AS LONG) AS node").collect()}

    def core_members(k):
        alive = set(nodes)
        while True:
            deg = {}
            for s, d in edges:
                if s in alive and d in alive:
                    deg[d] = deg.get(d, 0) + 1
            nxt = {n for n in alive if deg.get(n, 0) >= k}
            if nxt == alive:
                return alive
            alive = nxt

    deg0 = {}
    for s, d in edges:
        deg0[d] = deg0.get(d, 0) + 1
    want = {}
    cores = {k: core_members(k) for k in KCORE_KS}
    for n in nodes:
        c = 0
        if deg0.get(n, 0) >= 1:
            c = 1
        for k in KCORE_KS:
            if n in cores[k]:
                c = max(c, k)
        want[n] = c
    got = {r.node: r.coreness for r in k_core_decomposition(spark, sf_dir).collect()}
    assert got == want
    assert set(got.values()) != {0}, "graph unexpectedly empty"


def test_hybrid_rrf_consistent_with_legs(spark, sf_dir):
    """The fused table must reproduce each leg's rank, score strictly
    by the RRF formula, and contain both legs' #1 results."""
    from trace_parquet_spark.operators.ranking import (
        RRF_K,
        bm25_search,
        hybrid_search_rrf,
    )

    fused = hybrid_search_rrf(spark, sf_dir).collect()
    lex = {r.doc_id: r.rank for r in bm25_search(spark, sf_dir).collect()}
    for r in fused:
        expect = 0
        if r.lex_rank:
            assert lex[r.doc_id] == r.lex_rank
            expect += 1_000_000 // (RRF_K + r.lex_rank)
        if r.sem_rank:
            expect += 1_000_000 // (RRF_K + r.sem_rank)
        assert r.rrf_micro == expect
    # a doc ranked #1 by bm25 must appear in the fused top list
    top_lex = min(lex, key=lex.get)
    assert any(r.doc_id == top_lex for r in fused)
    # fused ranks are 1..N dense and ordered by score desc
    assert [r.fused_rank for r in fused] == list(range(1, len(fused) + 1))
    scores = [r.rrf_micro for r in fused]
    assert scores == sorted(scores, reverse=True)


def test_naive_bayes_matches_python_replay(spark, sf_dir):
    """The NB confusion matrix must match an independent pure-Python
    multinomial NB with the same Laplace smoothing and micro-nat
    quantization — every prediction, not just aggregate accuracy."""
    import math
    from collections import Counter, defaultdict

    from trace_parquet_spark.functions.text import tokens
    from trace_parquet_spark.operators.text_analysis import (
        naive_bayes_source_confusion,
    )

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", tokens("text").alias("tt"))
        .collect()
    )
    docs = [(r.doc_id, r.source, [t for t in r.tt if t]) for r in rows]
    cst = defaultdict(Counter)
    nd = Counter()
    vocab = set()
    for _, s, tt in docs:
        nd[s] += 1
        cst[s].update(tt)
        vocab.update(tt)
    V = len(vocab)
    n_docs = len(docs)
    classes = sorted(nd)
    ns = {s: sum(cst[s].values()) for s in classes}

    def micro(x):
        return math.floor(math.log(x) * 1e6 + 0.5)

    pri = {s: micro(nd[s] / n_docs) for s in classes}
    dflt = {s: micro(1.0 / (ns[s] + V)) for s in classes}
    want = Counter()
    for _, src, tt in docs:
        counts = Counter(tt)
        best = None
        for s in classes:
            sc = pri[s] + sum(
                n * (micro((cst[s][t] + 1) / (ns[s] + V)) if cst[s][t] else dflt[s])
                for t, n in counts.items()
            )
            if best is None or sc > best[0]:
                best = (sc, s)
        want[(src, best[1])] += 1
    got = {
        (r.source, r.predicted): r.n_docs
        for r in naive_bayes_source_confusion(spark, sf_dir).collect()
    }
    assert got == dict(want)


def test_postings_gamma_accounting_matches_python(spark, sf_dir):
    """γ-bit accounting must match an independent Python computation
    and show real savings in the dense band."""
    from collections import defaultdict

    from trace_parquet_spark.functions.text import tokens
    from trace_parquet_spark.operators.indexing import (
        postings_compression_stats,
    )

    post = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("tt"))
        .collect()
    ):
        for t in set(x for x in r.tt if x):
            post[t].append(r.doc_id)
    want = defaultdict(lambda: [0, 0, 0])
    for t, ids in post.items():
        ids.sort()
        gaps = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
        gbits = sum(2 * g.bit_length() - 1 for g in gaps)
        band = len(ids).bit_length()
        want[band][0] += 1
        want[band][1] += len(ids)
        want[band][2] += gbits
    got = {r.df_band: r for r in postings_compression_stats(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for band, (ntok, npost, gbits) in want.items():
        g = got[band]
        assert (g.n_tokens, g.n_postings, g.gamma_bits) == (ntok, npost, gbits)
        assert g.raw_bits == npost * 64
    # the densest band must show majority savings (the IR classic)
    top = got[max(got)]
    assert top.savings_ppm > 500_000


def test_simhash_blocking_is_lossless_and_prunes(spark, sf_dir):
    """Pigeonhole chunk blocking must find EVERY pair within the
    Hamming radius (guarantee, not heuristic) while generating far
    fewer candidates than all-pairs."""
    from pyspark.sql import functions as F

    from trace_parquet_spark.operators.dedup import (
        HAM_CHUNKS,
        HAM_MAX,
        simhash_docs,
        simhash_hamming_pairs,
    )

    sims = {r.doc_id: r.simhash for r in simhash_docs(spark, sf_dir).collect()}
    ids = sorted(sims)
    want = {
        (a, b, bin(sims[a] ^ sims[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sims[a] ^ sims[b]).count("1") <= HAM_MAX
    }
    got = {tuple(r) for r in simhash_hamming_pairs(spark, sf_dir).collect()}
    assert got == want
    # pruning: count blocked candidate pairs vs all pairs
    n = len(ids)
    all_pairs = n * (n - 1) // 2

    def chunks(s):
        return {(i, (s >> (8 * i)) & 255) for i in range(HAM_CHUNKS)}

    from collections import defaultdict

    by_chunk = defaultdict(list)
    for d, s in sims.items():
        for c in chunks(s):
            by_chunk[c].append(d)
    cand = set()
    for ds in by_chunk.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                cand.add((a, b))
    assert len(cand) < all_pairs / 3, (len(cand), all_pairs)


def test_winnowing_matches_python_replay(spark, sf_dir):
    """Fingerprint selection must match a pure-Python rightmost-min
    winnow exactly (positions AND hashes, via the digest), and sit
    near the theoretical 2/(w+1) density."""
    import hashlib

    from trace_parquet_spark.functions.text import tokens
    from trace_parquet_spark.operators.text_analysis import (
        WIN_K,
        WIN_W,
        winnowing_fingerprints,
    )

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("tt"))
        .collect()
    )
    got = {r.doc_id: r for r in winnowing_fingerprints(spark, sf_dir).collect()}
    n_checked = 0
    for r in rows:
        tt = r.tt
        if len(tt) < WIN_K:
            assert r.doc_id not in got
            continue
        def h32(x):
            return int(hashlib.md5(x.encode()).hexdigest()[:8], 16)

        hs = [
            h32(" ".join(tt[i : i + WIN_K]))
            for i in range(len(tt) - WIN_K + 1)
        ]
        picked = set()
        for end in range(WIN_W - 1, len(hs)):
            win = hs[end - WIN_W + 1 : end + 1]
            m = min(win)
            # rightmost position achieving the min
            off = max(j for j, v in enumerate(win) if v == m)
            picked.add((end - WIN_W + 1 + off, m))
        parts = sorted(f"{p:07d}:{h}" for p, h in picked)
        digest = hashlib.md5("|".join(parts).encode()).hexdigest()
        g = got[r.doc_id]
        assert g.n_fingerprints == len(picked)
        assert g.fingerprint_md5 == digest, r.doc_id
        n_checked += 1
    assert n_checked > 100
    # density near 2/(w+1) on average (loose band)
    dens = [g.density_ppm for g in got.values()]
    avg = sum(dens) / len(dens)
    assert 200_000 < avg < 700_000, avg


def test_ccnet_approx_no_per_language_window(spark, sf_dir):
    """ccnet_quality_buckets_approx exists to kill the exact version's
    per-language rank window (data-sized, skewed by the dominant
    language at 100×) — its own plan must carry no WindowExec at all,
    and any SinglePartition exchange must be the benign partial-agg
    global-scalar shape (the corpus token total), never data."""
    import re

    from trace_parquet_spark.operators.hygiene import (
        ccnet_quality_buckets_approx,
    )

    plan = (
        ccnet_quality_buckets_approx(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    for m in re.finditer(r"Exchange SinglePartition[^\n]*\n[^\n]*", plan):
        assert "partial_" in m.group(0), m.group(0)
    assert "BroadcastHashJoin" in plan  # the (lang, cell)->bucket map


def test_ccnet_approx_is_near_tertile(spark, sf_dir):
    """Per language, approx bucket sizes must deviate from n/3 by at
    most one bucket's mass (a histogram cell never exceeds the bucket
    that absorbs it), and bucket ceilings must respect the
    head <= middle <= tail quality order."""
    from collections import defaultdict

    from trace_parquet_spark.operators.hygiene import (
        ccnet_quality_buckets_approx,
    )

    rows = ccnet_quality_buckets_approx(spark, sf_dir).collect()
    per_lang = defaultdict(list)
    for r in rows:
        per_lang[r.lang].append(r)
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rs in per_lang.items():
        n = sum(r.n_docs for r in rs)
        bound = max(r.n_docs for r in rs)
        for r in rs:
            assert abs(r.n_docs - n / 3) <= bound, (lang, r)
        rs = sorted(rs, key=lambda r: order[r.bucket])
        for a, b in zip(rs, rs[1:]):
            assert a.ceiling_micro <= b.ceiling_micro, (lang, a, b)
