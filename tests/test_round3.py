"""Round-3 additions: collection (map/array) operators, exact-sum
statistics, rolling anomaly detection, and CDC/SCD2 shapes.

Semantic tests (the oracle parity gate covers value equality; these
pin the operator CONTRACTS — interval partitioning, tombstone
semantics, float-free anomaly algebra)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from trace_parquet_spark.operators.cdc import (
    DELETE_TYPE,
    cdc_apply_latest,
    scd2_user_event_type,
)
from trace_parquet_spark.plans.collections import (
    map_event_type_counts,
    vector_math_suite,
)
from trace_parquet_spark.plans.statistics import (
    group_moments_lineitem,
    rolling_anomaly_events,
)
from trace_parquet_spark.sources.registry import load_table


def test_map_counts_sum_to_user_totals(spark, sf_dir):
    got = map_event_type_counts(spark, sf_dir).collect()
    raw = dict(
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    assert len(got) == len(raw)
    for r in got:
        assert r.n_events == raw[r.user_id]
        entries = dict(
            kv.split(":") for kv in r.type_counts.split("|") if kv
        )
        assert len(entries) == r.n_types
        assert sum(int(v) for v in entries.values()) == r.n_events
        # hot_types is exactly the >= threshold subset, sorted
        hot = [k for k, v in sorted(entries.items()) if int(v) >= 25]
        assert r.hot_types == "|".join(hot)


def test_vector_math_matches_numpy(spark, sf_dir):
    rows = vector_math_suite(spark, sf_dir).limit(20).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float32)
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .collect()
    }
    for r in rows:
        q = np.floor(emb[r.vec_id].astype(np.float64) * 1e6 + 0.5).astype(
            np.int64
        )
        assert r.dim == len(q)
        assert r.norm2_q == int((q * q).sum())
        assert r.l1_q == int(np.abs(q).sum())
        assert r.dot_rev_q == int((q * q[::-1]).sum())
        assert r.max_q == int(q.max()) and r.min_q == int(q.min())
        assert abs(r.l2_norm - np.sqrt(r.norm2_q / 1e12)) == 0.0


def test_group_moments_match_numpy(spark, sf_dir):
    got = {r.l_returnflag: r for r in group_moments_lineitem(spark, sf_dir).collect()}
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, grp in pdf.groupby("l_returnflag"):
        x = grp["l_quantity"].to_numpy(dtype=np.float64)
        y = np.floor(grp["l_extendedprice"].to_numpy() * 100 + 0.5) / 100.0
        r = got[flag]
        assert r.n == len(grp)
        assert abs(r.mean_qty - x.mean()) < 1e-9
        assert abs(r.mean_price - y.mean()) < 1e-6
        # population variance (the /n² formula)
        assert abs(r.var_price - y.var()) < 1e-4 * max(1.0, y.var())
        cc = np.corrcoef(x, y)[0, 1]
        assert abs(r.corr_qty_price - cc) < 1e-9


def test_rolling_anomaly_agrees_with_pandas(spark, sf_dir):
    got = rolling_anomaly_events(spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    flagged = {(r.user_id, r.event_id) for r in got}
    expect = set()
    for uid, grp in ev.groupby("user_id"):
        qv = np.floor(grp["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        ids = grp["event_id"].to_numpy()
        for i in range(len(qv)):
            lo = max(0, i - 20)
            fr = qv[lo:i]
            w = len(fr)
            if w < 10:
                continue
            sw, sww = int(fr.sum()), int((fr.astype(object) ** 2).sum())
            dev = w * int(qv[i]) - sw
            if dev * dev > 9 * (w * sww - sw * sw):
                expect.add((uid, int(ids[i])))
    assert flagged == expect
    assert len(flagged) > 0


def test_scd2_intervals_partition_timeline(spark, sf_dir):
    hist = scd2_user_event_type(spark, sf_dir).toPandas()
    for uid, grp in hist.groupby("user_id"):
        grp = grp.sort_values("version")
        # versions are 1..k dense
        assert list(grp["version"]) == list(range(1, len(grp) + 1))
        # each interval ends where the next begins; only the last is open
        nxt = grp["valid_from"].shift(-1)
        closed = grp["valid_to"].iloc[:-1]
        assert (closed.to_numpy() == nxt.iloc[:-1].to_numpy()).all()
        assert pd.isna(grp["valid_to"].iloc[-1])
        assert bool(grp["is_current"].iloc[-1])
        assert not grp["is_current"].iloc[:-1].any()
        # consecutive segments always change the attribute value
        assert (grp["event_type"].shift() != grp["event_type"]).iloc[1:].all()


def test_cdc_tombstone_removes_key(spark, sf_dir):
    state = {r.user_id: r for r in cdc_apply_latest(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, grp in ev.groupby("user_id"):
        last = grp.iloc[-1]
        if last["event_type"] == DELETE_TYPE:
            assert uid not in state
        else:
            assert state[uid].last_event_id == last["event_id"]
            assert state[uid].last_value == last["value"]


def test_frame_sample_semantics(spark, sf_dir):
    import hashlib

    from trace_parquet_spark.operators.multimodal import (
        FRAME_CHARS,
        MAX_FRAMES,
        multimodal_frame_sample,
    )

    rows = multimodal_frame_sample(spark, sf_dir).collect()
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
        if r.text
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, frames in by_doc.items():
        text = texts[doc_id]
        n_frames = -(-len(text) // FRAME_CHARS)
        assert len(frames) == min(MAX_FRAMES, n_frames)
        idxs = [f.frame_idx for f in frames]
        assert idxs == sorted(set(idxs))  # distinct, ascending
        for f in frames:
            chunk = text[f.frame_idx * FRAME_CHARS:(f.frame_idx + 1) * FRAME_CHARS]
            assert f.frame_chars == len(chunk)
            assert f.frame_md5 == hashlib.md5(chunk.encode()).hexdigest()


def test_funnel_monotone_and_cohort_bounds(spark, sf_dir):
    from trace_parquet_spark.plans.funnels import (
        STAGES,
        cohort_retention,
        funnel_conversion,
    )

    fr = funnel_conversion(spark, sf_dir).collect()
    assert [r.stage_name for r in fr] == STAGES
    ns = [r.n_users for r in fr]
    assert ns == sorted(ns, reverse=True)  # funnel can only narrow
    assert fr[0].conv_from_prev is None
    for prev, r in zip(fr, fr[1:]):
        assert r.conv_from_prev == r.n_users / prev.n_users

    cr = cohort_retention(spark, sf_dir).collect()
    assert len(cr) > 0
    for r in cr:
        if r.week_k == 0:
            assert r.retention == 1.0
        assert 0.0 < r.retention <= 1.0


def test_recursive_closure_equals_brute_force_groups(spark, sf_dir):
    import itertools
    import re

    from trace_parquet_spark.plans.recursive import (
        dup_chain_closure,
        recursive_date_spine,
    )

    got = {(r.doc_a, r.doc_b) for r in dup_chain_closure(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    groups = {}
    for r in docs:
        toks = re.sub(r"\s+", " ", (r.text or "").lower().strip()).split(" ")
        groups.setdefault(" ".join(toks[:2]), []).append(r.doc_id)
    expect = set()
    for ids in groups.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            expect.add((a, b))
    assert got == expect and len(got) > 0

    spine = recursive_date_spine(spark, sf_dir).collect()
    days = [r.day for r in spine]
    assert (days[-1] - days[0]).days == len(days) - 1  # contiguous
    assert sum(r.n_events for r in spine) == load_table(
        spark, sf_dir, "events"
    ).count()


def test_analytics_more_contracts(spark, sf_dir):
    from trace_parquet_spark.plans.analytics_more import (
        N_BUCKETS,
        equi_depth_price_buckets,
        range_frame_hourly_totals,
    )

    # RANGE frame: every row counts itself; totals are >= own value
    rows = range_frame_hourly_totals(spark, sf_dir).limit(500).collect()
    assert all(r.n_1h >= 1 for r in rows)

    # brute-force one user
    one = [r for r in rows if r.user_id == rows[0].user_id]
    for r in one:
        n = sum(1 for o in one if r.epoch_s - 3600 <= o.epoch_s <= r.epoch_s)
        assert r.n_1h == n

    bk = equi_depth_price_buckets(spark, sf_dir).collect()
    assert len(bk) == N_BUCKETS
    sizes = [r.n_orders for r in bk]
    assert max(sizes) - min(sizes) <= 1  # equi-depth ±1
    for a, b in zip(bk, bk[1:]):
        assert a.hi <= b.lo  # buckets are ordered, non-overlapping spans


def test_feature_hash_and_dq(spark, sf_dir):
    import hashlib

    from trace_parquet_spark.operators.featurize import (
        N_FEATURES,
        dq_check_orders,
        feature_hash_docs,
    )

    rows = feature_hash_docs(spark, sf_dir).limit(30).collect()
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    import re

    for r in rows:
        vec = [int(x) for x in r.tf_vec.split("|")]
        assert len(vec) == N_FEATURES
        assert sum(vec) == r.n_tokens
        assert sum(1 for v in vec if v > 0) == r.nnz
        toks = [
            t
            for t in re.sub(r"\s+", " ", docs[r.doc_id].lower().strip()).split(" ")
            if t
        ]
        expect = [0] * N_FEATURES
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % N_FEATURES
            expect[b] += 1
        assert vec == expect

    dq = {r.rule: r.n_violations for r in dq_check_orders(spark, sf_dir).collect()}
    assert set(dq) == {
        "dup_orderkeys",
        "null_custkeys",
        "price_out_of_range",
        "bad_status",
        "orphan_custkeys",
    }
    # the generated batch is clean — every rule must report zero
    assert all(v == 0 for v in dq.values()), dq


def test_prep_operators(spark, sf_dir):
    from trace_parquet_spark.operators.prep import (
        balanced_sample_embeddings,
        redact_props,
        skipgram_pairs,
    )

    # skip-gram: symmetric window => (a,b) count equals (b,a) count
    sg = {(r.center, r.context): r.n for r in skipgram_pairs(spark, sf_dir).collect()}
    assert len(sg) > 0
    for (a, b), n in sg.items():
        assert sg.get((b, a)) == n

    bal = balanced_sample_embeddings(spark, sf_dir).toPandas()
    sizes = bal.groupby("label").size()
    assert sizes.nunique() == 1  # perfectly balanced
    full = load_table(spark, sf_dir, "embeddings").groupBy("label").count().collect()
    assert sizes.iloc[0] == min(r["count"] for r in full)

    red = redact_props(spark, sf_dir).limit(50).collect()
    for r in red:
        assert "<NUM>" in r.redacted or r.n_redactions == 0
        assert not any(c.isdigit() for c in r.redacted)


def test_pmi_properties(spark, sf_dir):
    import math

    from trace_parquet_spark.operators.prep import pmi_token_pairs, skipgram_pairs

    pmi = pmi_token_pairs(spark, sf_dir).collect()
    sg = {(r.center, r.context): r.n for r in skipgram_pairs(spark, sf_dir).collect()}
    marg = {}
    for (a, _b), n in sg.items():
        marg[a] = marg.get(a, 0) + n
    total = sum(sg.values())
    assert len(pmi) == len(sg)
    for r in pmi:
        expect = math.log(r.n * total / (marg[r.center] * marg[r.context]))
        assert abs(r.pmi6 - expect) < 2e-6
        # symmetry: PMI(a,b) == PMI(b,a)
    by_pair = {(r.center, r.context): r.pmi6 for r in pmi}
    for (a, b), v in by_pair.items():
        assert by_pair[(b, a)] == v


def test_graph_metrics_consistency(spark, sf_dir):
    import itertools
    import re

    from trace_parquet_spark.operators.graph_metrics import (
        degree_distribution,
        triangle_list,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    groups = {}
    for r in docs:
        key = " ".join(
            re.sub(r"\s+", " ", (r.text or "").lower().strip()).split(" ")[:2]
        )
        groups.setdefault(key, []).append(r.doc_id)

    expect_tris = set()
    for ids in groups.values():
        for tri in itertools.combinations(sorted(ids), 3):
            expect_tris.add(tri)
    got_tris = {
        (r.doc_a, r.doc_b, r.doc_c) for r in triangle_list(spark, sf_dir).collect()
    }
    assert got_tris == expect_tris and len(got_tris) > 0

    # cliques of size k contribute k nodes of degree k-1
    expect_deg = {}
    for ids in groups.values():
        if len(ids) > 1:
            expect_deg[len(ids) - 1] = expect_deg.get(len(ids) - 1, 0) + len(ids)
    got_deg = {r.degree: r.n_nodes for r in degree_distribution(spark, sf_dir).collect()}
    assert got_deg == expect_deg
