"""Property-based tests: the custom operators against independent
reference implementations (pandas) on randomized inputs.

Spark session startup is expensive, so hypothesis drives data
generation only (deadline disabled, examples bounded); each example
round-trips through the real operators.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trace_parquet_spark.operators.asof import asof_join_backward
from trace_parquet_spark.operators.sessionize import sessionize

BASE = pd.Timestamp("2024-01-01")


def _events(draw, key_pool, n):
    rows = []
    for i in range(n):
        rows.append(
            (
                draw(st.sampled_from(key_pool)),
                i,  # unique id
                (
                    BASE + pd.Timedelta(seconds=draw(st.integers(0, 7200)))
                ).to_pydatetime(),
            )
        )
    return rows


@st.composite
def asof_case(draw):
    left = _events(draw, [1, 2], draw(st.integers(1, 12)))
    right = _events(draw, [1, 2], draw(st.integers(1, 12)))
    return left, right


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(asof_case())
def test_asof_matches_pandas_merge_asof(spark, case):
    left, right = case
    ldf = spark.createDataFrame(left, "k int, id int, ts timestamp")
    rdf = spark.createDataFrame(right, "k int, id int, ts timestamp")
    got = {
        r.id: r.asof_id
        for r in asof_join_backward(
            ldf, rdf, "k", "ts", "ts", right_cols=["id"],
            tiebreak="id", inner=False,
        ).collect()
    }

    lpd = pd.DataFrame(left, columns=["k", "id", "ts"]).sort_values(
        ["ts", "id"], kind="mergesort"
    )
    # pandas merge_asof keeps the LAST right row on ties only if sorted;
    # sort by (ts, id) so the max-id-at-equal-ts row wins, matching ours
    rpd = pd.DataFrame(right, columns=["k", "id", "ts"]).sort_values(
        ["ts", "id"], kind="mergesort"
    )
    merged = pd.merge_asof(
        lpd, rpd, on="ts", by="k", direction="backward", suffixes=("", "_r")
    )
    expect = {
        int(row.id): (None if pd.isna(row.id_r) else int(row.id_r))
        for row in merged.itertuples()
    }
    assert got == expect


@st.composite
def session_case(draw):
    return _events(draw, [1, 2, 3], draw(st.integers(1, 20)))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(session_case())
def test_sessionize_matches_reference(spark, rows):
    gap_min = 10
    df = spark.createDataFrame(
        [(k, i, ts, 0.0) for k, i, ts in rows],
        "user_id int, event_id int, ts timestamp, value double",
    )
    got = {
        r.event_id: r.session_id
        for r in sessionize(df, gap_minutes=gap_min).collect()
    }

    # reference: per key, sort by (ts, id), bump session on gap > 10min
    expect: dict[int, int] = {}
    pdf = pd.DataFrame(rows, columns=["k", "id", "ts"])
    for _, grp in pdf.groupby("k"):
        grp = grp.sort_values(["ts", "id"], kind="mergesort")
        sid, prev = 0, None
        for row in grp.itertuples():
            if prev is None or (row.ts - prev).total_seconds() > gap_min * 60:
                sid += 1
            expect[int(row.id)] = sid
            prev = row.ts
    assert got == expect


@st.composite
def random_graph(draw):
    n = draw(st.integers(2, 24))
    n_edges = draw(st.integers(1, 40))
    edges = [
        (
            draw(st.integers(0, n - 1)),
            draw(st.integers(0, n - 1)),
        )
        for _ in range(n_edges)
    ]
    return [(a, b) for a, b in edges if a != b] or [(0, 1)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(random_graph())
def test_star_cc_matches_union_find(spark, edges):
    """connected_components_star vs a driver-side union-find oracle on
    random multigraphs (self-loops stripped, duplicates kept)."""
    from trace_parquet_spark.operators.dedup_clusters import (
        connected_components_star,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components_star(df).collect()
    }
    assert got == want


@settings(max_examples=50, deadline=None)
@given(
    st.integers(0, 255),
    st.integers(0, 255),
)
def test_morton_interleave_is_bijective_and_monotone_in_prefix(a, b):
    """The Morton code's defining property, checked in plain Python
    against the generated Spark expression semantics: interleaving is
    a bijection [0,256)² → [0,65536) and the top 2k bits are exactly
    the k-bit prefixes of both inputs interleaved."""
    from trace_parquet_spark.operators.zorder import BITS

    z = 0
    for i in range(BITS):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    # invert
    ra = rb = 0
    for i in range(BITS):
        ra |= ((z >> (2 * i + 1)) & 1) << i
        rb |= ((z >> (2 * i)) & 1) << i
    assert (ra, rb) == (a, b)
    # prefix locality: the 6-bit bucket is the two 3-bit key prefixes
    # interleaved (a-bits at odd positions, b-bits at even)
    bucket = z >> (2 * BITS - 6)
    a_pref = ((bucket >> 5 & 1) << 2) | ((bucket >> 3 & 1) << 1) | (bucket >> 1 & 1)
    b_pref = ((bucket >> 4 & 1) << 2) | ((bucket >> 2 & 1) << 1) | (bucket & 1)
    assert a_pref == a >> (BITS - 3)
    assert b_pref == b >> (BITS - 3)


# ---------------------------------------------------------------- ts bounds


@settings(deadline=None, max_examples=200)
@given(
    st.datetimes(
        min_value=pd.Timestamp("1970-01-01").to_pydatetime(),
        max_value=pd.Timestamp("2200-01-01").to_pydatetime(),
    ),
    st.integers(0, 10**9),
)
def test_ts_bounds_nanos_is_exact_between(start, span_us):
    """For arbitrary post-epoch bounds, a nanos value n is inside
    [lo, hi] iff its µs truncation is inside [start, end] — the exact
    inclusive-BETWEEN property the parquet pushdown relies on."""
    from datetime import timedelta

    from trace_parquet_spark.sources.registry import (
        _epoch_micros_utc,
        ts_bounds_nanos,
    )

    end = start + timedelta(microseconds=span_us)
    lo, hi = ts_bounds_nanos(start, end)
    s_us, e_us = _epoch_micros_utc(start), _epoch_micros_utc(end)
    assert lo == s_us * 1000 and hi == e_us * 1000 + 999
    # boundary nanos: first included / last included / first excluded
    for n in (lo - 1, lo, hi, hi + 1):
        inside_nanos = lo <= n <= hi
        inside_micros = s_us <= n // 1000 <= e_us
        assert inside_nanos == inside_micros, n


# ---------------------------------------------------------------------------
# round-7 statistics kernels on randomized event tables (tie-heavy)
# ---------------------------------------------------------------------------


@st.composite
def tiny_events(draw):
    """Random events with DELIBERATE ties: values from a 5-point grid
    and timestamps from a 6-slot grid, so argmax/rank tie-break rules
    actually fire."""
    n = draw(st.integers(4, 24))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                (
                    BASE + pd.Timedelta(seconds=draw(st.integers(0, 5)) * 60)
                ).to_pydatetime(),
                draw(st.integers(1, 3)),
                draw(st.sampled_from(["a", "b"])),
                float(draw(st.sampled_from([0.0, 1.25, 2.5, 2.5, 7.75]))),
                "{}",
            )
        )
    return rows


def _write_events(spark, tmpdir, rows):
    import os

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmpdir, "events.parquet")
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(tiny_events())
def test_cusum_property_random_tables(spark, tmp_path_factory, rows):
    import numpy as np

    from trace_parquet_spark.plans.statistics import cusum_changepoint_scan

    tmpdir = str(tmp_path_factory.mktemp("cusumprop"))
    _write_events(spark, tmpdir, rows)
    out = {r["event_type"]: r for r in cusum_changepoint_scan(spark, tmpdir).collect()}
    groups = {}
    for eid, ts, uid, et, val, _ in rows:
        groups.setdefault(et, []).append((ts, eid, int(np.floor(val * 100 + 0.5))))
    for et, g in groups.items():
        g.sort()
        xs = [x for _, _, x in g]
        n, s = len(xs), sum(xs)
        pfx, best = 0, None
        for i, (ts, eid, x) in enumerate(g, start=1):
            pfx += x
            nd = abs(n * pfx - i * s)
            key = (-nd, ts, eid)
            if best is None or key < best[0]:
                best = (key, i, nd)
        r = out[et]
        assert (r["change_pos"], r["abs_nd"]) == (best[1], best[2])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(tiny_events())
def test_trimmed_mean_and_mode_property_random_tables(
    spark, tmp_path_factory, rows
):
    import numpy as np

    from trace_parquet_spark.plans.statistics import (
        TRIM_PCT,
        trimmed_mean_by_group,
    )

    tmpdir = str(tmp_path_factory.mktemp("trimprop"))
    _write_events(spark, tmpdir, rows)
    out = {
        r["event_type"]: r
        for r in trimmed_mean_by_group(spark, tmpdir).collect()
    }
    groups = {}
    for eid, ts, uid, et, val, _ in rows:
        groups.setdefault(et, []).append(
            (int(np.floor(val * 100 + 0.5)), ts, eid)
        )
    for et, g in groups.items():
        g.sort()
        xs = [x for x, _, _ in g]
        n = len(xs)
        k = n * TRIM_PCT // 100
        kept = xs[k : n - k]
        r = out[et]
        assert r["n_kept"] == len(kept)
        assert abs(r["trimmed_mean"] - sum(kept) / len(kept) / 100.0) < 1e-12


@st.composite
def tiny_docs(draw):
    """Random documents with tied lengths and single-doc sources."""
    n = draw(st.integers(2, 20))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                "w " * draw(st.integers(1, 30)),
                "en",
                draw(st.sampled_from(["s1", "s2", "s3"])),
                0,
            )
        )
    return [(i, t, lg, src, len(t)) for i, t, lg, src, _ in rows]


def _write_docs(spark, tmpdir, rows):
    import os

    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmpdir, "documents.parquet")
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(tiny_docs())
def test_gini_and_quantile_norm_properties(spark, tmp_path_factory, rows):
    from trace_parquet_spark.plans.statistics import (
        gini_by_source,
        quantile_normalize_lengths,
    )

    tmpdir = str(tmp_path_factory.mktemp("giniprop"))
    _write_docs(spark, tmpdir, rows)
    gini = {r["source"]: r for r in gini_by_source(spark, tmpdir).collect()}
    by_src: dict[str, list] = {}
    for i, t, lg, src, nch in rows:
        by_src.setdefault(src, []).append(nch)
    for src, xs in by_src.items():
        r = gini[src]
        # bounds and exact rational consistency
        assert 0 <= r["gini"] < 1
        assert r["gini"] == r["gini_num"] / r["gini_den"]
        # permutation invariance is structural (sorted ranks); equal
        # values => gini 0
        if len(set(xs)) == 1:
            assert r["gini_num"] == (
                2 * sum((i + 1) * x for i, x in enumerate(sorted(xs)))
                - (len(xs) + 1) * sum(xs)
            )
    qn = {r["doc_id"]: r for r in quantile_normalize_lengths(spark, tmpdir).collect()}
    all_sorted = sorted(nch for _, _, _, _, nch in rows)
    assert len(qn) == len(rows)
    for did, r in qn.items():
        # the normalized value is always a real global order statistic
        assert r["qnorm_chars"] in all_sorted
    # per-source monotonicity: higher raw length never maps lower
    for src, _ in by_src.items():
        pts = sorted(
            (r["n_chars"], r["doc_id"], r["qnorm_chars"])
            for r in qn.values()
            if any(
                rr[3] == src and rr[0] == r["doc_id"] for rr in rows
            )
        )
        for (x1, _, q1), (x2, _, q2) in zip(pts, pts[1:]):
            assert q1 <= q2


@st.composite
def conversion_events(draw):
    """Random signup/purchase histories with censoring: some users
    never purchase, some purchase before signup (must not count)."""
    n_users = draw(st.integers(2, 8))
    rows = []
    eid = 0
    for u in range(1, n_users + 1):
        t0 = draw(st.integers(0, 5))
        rows.append((eid, t0, u, "signup"))
        eid += 1
        for _ in range(draw(st.integers(0, 3))):
            tp = draw(st.integers(0, 12))
            rows.append((eid, tp, u, "purchase"))
            eid += 1
    return rows


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(conversion_events())
def test_kaplan_meier_property_random_tables(spark, tmp_path_factory, rows):
    import os

    import numpy as np

    from trace_parquet_spark.plans.funnels import kaplan_meier_conversion

    tmpdir = str(tmp_path_factory.mktemp("kmprop"))
    spark.createDataFrame(
        [
            (
                eid,
                (BASE + pd.Timedelta(days=day)).to_pydatetime(),
                uid,
                et,
                1.0,
                "{}",
            )
            for eid, day, uid, et in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmpdir, "events.parquet")
    )
    curve = kaplan_meier_conversion(spark, tmpdir).collect()
    # python replay with the same censoring convention
    sign, purch = {}, {}
    tmax = max(day for _, day, _, _ in rows)
    for eid, day, uid, et in rows:
        if et == "signup":
            sign[uid] = min(sign.get(uid, day), day)
    for eid, day, uid, et in rows:
        if et == "purchase" and uid in sign and day > sign[uid]:
            purch[uid] = min(purch.get(uid, day), day)
    times = [
        (purch[u] - t0, True) if u in purch else (tmax - t0, False)
        for u, t0 in sign.items()
    ]
    from collections import Counter

    at = Counter(t for t, _ in times)
    d = Counter(t for t, e in times if e)
    got = {r["t_days"]: r for r in curve}
    assert sorted(got) == sorted(d)
    removed = 0
    surv_ppm_prev = 10**6
    for t in sorted(at):
        n_risk = len(times) - removed
        removed += at[t]
        if d[t] == 0:
            continue
        r = got[t]
        assert (r["n_risk"], r["d_events"]) == (n_risk, d[t])
        # survival is monotone non-increasing and in [0, 1e6]
        assert 0 <= r["s_hat_ppm"] <= surv_ppm_prev
        surv_ppm_prev = r["s_hat_ppm"]
        if n_risk == d[t]:
            assert r["s_hat_ppm"] == 0


@st.composite
def tiny_orders(draw):
    n = draw(st.integers(1, 30))
    return [
        (
            i,
            i % 5,
            draw(st.sampled_from(["O", "F", "P"])),
            float(draw(st.integers(1, 99999))) / 10.0,
            (BASE + pd.Timedelta(days=i)).to_pydatetime(),
            "1-URGENT",
        )
        for i in range(n)
    ]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(tiny_orders())
def test_benford_property_random_orders(spark, tmp_path_factory, rows):
    import os

    import numpy as np

    from trace_parquet_spark.plans.statistics import benford_digit_dq

    tmpdir = str(tmp_path_factory.mktemp("benford"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmpdir, "orders.parquet")
    )
    out = benford_digit_dq(spark, tmpdir).collect()
    assert [r["digit"] for r in out] == list(range(1, 10))
    from collections import Counter

    # model mirrors the cents-grid population rule: rows flooring to
    # v=0 (0 < p < 0.005) have no first digit and are excluded from
    # both the digit cells and n_tot
    obs = Counter(
        int(str(int(np.floor(p * 100 + 0.5)))[0])
        for _, _, _, p, _, _ in rows
        if p > 0 and int(np.floor(p * 100 + 0.5)) >= 1
    )
    n = sum(obs.values())
    for r in out:
        p_micro = int(np.floor(np.log10(1 + 1 / r["digit"]) * 1e6 + 0.5))
        assert r["n_obs"] == obs.get(r["digit"], 0)
        assert r["exp_micro"] == n * p_micro
        assert r["dev_ppm"] == 1_000_000 * r["n_obs"] - r["exp_micro"]
        if r["exp_micro"] > 0:
            assert r["chi2_term"] == r["dev_ppm"] ** 2 // r["exp_micro"]
        else:
            assert r["chi2_term"] is None


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(tiny_orders())
def test_topk_with_ties_property(spark, tmp_path_factory, rows):
    import os

    import numpy as np

    from trace_parquet_spark.plans.relational_more import (
        TOPK_TIES_K,
        topk_with_ties,
    )

    tmpdir = str(tmp_path_factory.mktemp("ties"))
    # force heavy ties: quantize totals to a 4-value grid
    rows = [
        (k, c, s, float((int(p) % 4 + 1) * 100), d, pr)
        for k, c, s, p, d, pr in rows
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmpdir, "orders.parquet")
    )
    out = topk_with_ties(spark, tmpdir).collect()
    all_cents = [int(np.floor(p * 100 + 0.5)) for _, _, _, p, _, _ in rows]
    # rank(r) <= K  <=>  fewer than K rows have a strictly greater value
    expect = sorted(
        k
        for (k, _, _, p, _, _), c in zip(
            rows, (int(np.floor(p * 100 + 0.5)) for _, _, _, p, _, _ in rows)
        )
        if sum(1 for o in all_cents if o > c) < TOPK_TIES_K
    )
    assert sorted(r["o_orderkey"] for r in out) == expect
    # rank values are dense-free (gaps allowed) but bounded by K
    assert all(1 <= r["rk"] <= TOPK_TIES_K for r in out)
