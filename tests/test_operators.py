"""Semantics tests for the custom (non-builtin) operators with tiny
hand-built frames — edge cases the sf-scale oracle check can miss."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from trace_parquet_spark.operators.asof import asof_join_backward
from trace_parquet_spark.operators.sessionize import sessionize


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_basic_and_ties(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T10:00:00")),   # after r2 → r2
            (1, 101, _ts("2024-01-01T09:00:00")),   # equal ts as r1 → r1 visible
            (1, 102, _ts("2024-01-01T08:00:00")),   # before all → dropped (inner)
            (2, 103, _ts("2024-01-01T12:00:00")),   # no right rows for key → dropped
        ],
        "user_id int, event_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 11, _ts("2024-01-01T09:00:00")),
            (1, 12, _ts("2024-01-01T09:30:00")),
            (1, 13, _ts("2024-01-01T09:30:00")),    # tie with 12 → 13 wins (max id)
        ],
        "user_id int, event_id int, ts timestamp",
    )
    got = {
        r.event_id: (r.asof_event_id, r.asof_ts)
        for r in asof_join_backward(
            left, right, "user_id", "ts", "ts",
            right_cols=["event_id", "ts"], tiebreak="event_id",
        ).collect()
    }
    assert set(got) == {100, 101}
    assert got[100][0] == 13          # latest ≤ 10:00 is the 09:30 tie → max id
    assert got[101][0] == 11          # equal-ts right row is visible


def test_asof_outer_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T00:00:00"))], "k int, id int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 9, _ts("2024-01-02T00:00:00"))], "k int, id int, ts timestamp"
    )
    rows = asof_join_backward(
        left, right, "k", "ts", "ts", right_cols=["id"], inner=False
    ).collect()
    assert len(rows) == 1 and rows[0].asof_id is None


def test_sessionize_gap_boundary(spark):
    # events at 0, +30min (== gap → same session), +61min (> gap → new)
    df = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T00:00:00"), 0.0),
            (1, 2, _ts("2024-01-01T00:30:00"), 0.0),
            (1, 3, _ts("2024-01-01T01:31:00"), 0.0),
            (2, 4, _ts("2024-01-01T00:00:00"), 0.0),
        ],
        "user_id int, event_id int, ts timestamp, value double",
    )
    got = {
        r.event_id: r.session_id
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got[1] == 1 and got[2] == 1      # 30min gap is NOT > 30min
    assert got[3] == 2                      # 61min gap starts session 2
    assert got[4] == 1                      # independent key


def test_entry_contract(spark, sf_dir):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query at least plans and returns rows at the smallest sf
    sample = ["q1_pricing_summary", "trace_filter_export", "sessionize_events"]
    for name in sample:
        assert qs[name](spark, sf_dir).count() > 0


def test_approx_distinct_within_tolerance(spark, sf_dir):
    import __spark_entry__ as e

    from trace_parquet_spark.plans.relational import approx_distinct_detail

    row = approx_distinct_detail(spark, sf_dir).collect()[0]
    from trace_parquet_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey"), F.countDistinct("l_partkey")
    ).collect()[0]
    assert abs(row.approx_orders - exact[0]) / exact[0] < 0.05
    assert abs(row.approx_parts - exact[1]) / exact[1] < 0.05
    # the in-row acceptance evidence must agree with the recomputation
    assert row.exact_orders == exact[0] and row.exact_parts == exact[1]
    assert row.within_gate == 1
    # the gated registry entry collapses to oracle-derivable columns
    gated = e.queries()["approx_distinct"](spark, sf_dir).collect()[0]
    assert gated.exact_orders == exact[0] and gated.within_gate == 1
    assert sorted(gated.asDict()) == [
        "exact_orders", "exact_parts", "gate_permille", "within_gate",
    ]


def test_multi_format_roundtrip_reconciles(spark, sf_dir):
    """CSV/JSON/ORC writers+readers round-trip the shared orders slice
    exactly: per-format counts reconcile with the residue classes and
    the three formats partition the slice."""
    from trace_parquet_spark.sources.formats import multi_format_roundtrip
    from trace_parquet_spark.sources.registry import load_table

    rows = {r.format: r for r in multi_format_roundtrip(spark, sf_dir).collect()}
    assert sorted(rows) == ["csv", "json", "orc"]
    sl = load_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderkey % 8 IN (0, 5)")
    )
    by_mod = {
        int(r.m): int(r.n)
        for r in sl.groupBy(F.expr("o_orderkey % 3").alias("m"))
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert rows["csv"].n_rows == by_mod.get(0, 0)
    assert rows["json"].n_rows == by_mod.get(1, 0)
    assert rows["orc"].n_rows == by_mod.get(2, 0)
