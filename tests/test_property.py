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
