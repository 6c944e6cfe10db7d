"""Time-range pushdown on the events table: the bounds arithmetic
(``ts_bounds_nanos``), the tz/ordering validation, and BOTH physical
encodings — the micros fixtures in /root/testdata and a synthetic
TIMESTAMP(NANOS) fixture (the encoding the defensive bigint branch in
``load_table`` exists for). The reference pushes this exact predicate
to its store (ParameterDataRepository.java:66-67)."""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as papq
import pytest

from trace_parquet_spark.sources.registry import (
    load_table,
    ts_bounds_nanos,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- bounds math


def test_bounds_exact_values():
    lo, hi = ts_bounds_nanos("2024-01-01 00:00:00", "2024-01-01 00:00:01")
    start_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch-µs
    assert lo == start_us * 1000
    assert hi == (start_us + 1_000_000) * 1000 + 999


def test_bounds_inclusive_999_edge():
    """A nanos value within [end*1000, end*1000+999] truncates to
    exactly end µs → must be INSIDE; end*1000+1000 truncates to the
    next µs → outside. The +999 is what makes BETWEEN inclusive."""
    _, hi = ts_bounds_nanos("2024-01-01", "2024-01-01 00:00:00.000123")
    end_us = 1_704_067_200_000_123
    assert hi == end_us * 1000 + 999
    assert hi // 1000 == end_us          # still truncates to end
    assert (hi + 1) // 1000 == end_us + 1  # first excluded nano


def test_bounds_microsecond_precision():
    lo, _ = ts_bounds_nanos("2024-01-01 00:00:00.000042", "2024-01-02")
    assert lo % 1_000_000_000 == 42_000


def test_aware_inputs_normalized_to_utc():
    """'05:00+05:00' IS midnight UTC — aware inputs must not shift the
    window by their offset (ADVICE: timegm on an aware tuple would)."""
    naive = ts_bounds_nanos("2024-01-01 00:00:00", "2024-01-02 00:00:00")
    offset = ts_bounds_nanos(
        "2024-01-01T05:00:00+05:00", "2024-01-02T05:00:00+05:00"
    )
    aware_dt = ts_bounds_nanos(
        datetime(2024, 1, 1, tzinfo=timezone.utc),
        datetime(2024, 1, 2, tzinfo=timezone.utc),
    )
    assert naive == offset == aware_dt


def test_reversed_bounds_raise():
    with pytest.raises(ValueError, match="reversed"):
        ts_bounds_nanos("2024-02-01", "2024-01-01")


def test_pre_epoch_bounds_raise():
    with pytest.raises(ValueError, match="pre-epoch"):
        ts_bounds_nanos("1969-12-31 23:59:59", "2024-01-01")


# ------------------------------------------------- micros fixtures (current)


def test_micros_fixture_range_pushes(spark, sf_dir):
    df = load_table(
        spark, sf_dir, "events",
        ts_between=("2024-01-05 00:00:00", "2024-01-20 00:00:00"),
    ).select("event_id", "ts")
    plan = _plan(df)
    assert "GreaterThanOrEqual(ts" in plan
    assert "LessThanOrEqual(ts" in plan


def test_micros_fixture_rows_match_derived_filter(spark, sf_dir):
    from pyspark.sql import functions as F

    win = ("2024-01-05 00:00:00", "2024-01-20 00:00:00")
    pushed = load_table(spark, sf_dir, "events", ts_between=win).count()
    derived = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").between(
            F.lit(win[0]).cast("timestamp_ntz"),
            F.lit(win[1]).cast("timestamp_ntz"),
        ))
        .count()
    )
    assert pushed == derived > 0


def test_ts_between_rejected_for_other_tables(spark, sf_dir):
    with pytest.raises(ValueError, match="events"):
        load_table(spark, sf_dir, "orders", ts_between=("2024-01-01", "2024-01-02"))


# ------------------------------------------- nanos fixture (defensive branch)


@pytest.fixture(scope="module")
def nanos_dir(tmp_path_factory):
    """events.parquet with physical TIMESTAMP(NANOS), boundary-heavy:
    rows straddle both window edges at single-nano offsets."""
    base = tmp_path_factory.mktemp("nanos_fixture")
    start_ns = 1_704_412_800_000_000_000  # 2024-01-05T00:00:00Z
    end_us = 1_705_708_800_000_000        # 2024-01-20T00:00:00Z (µs)
    ts_ns = [
        start_ns - 1,          # 1ns before window → out
        start_ns,              # exact start → in
        start_ns + 999,        # truncates to start µs → in
        end_us * 1000,         # exact end → in
        end_us * 1000 + 999,   # truncates to end µs → in (the +999 edge)
        end_us * 1000 + 1000,  # first excluded nano → out
    ]
    t = pa.table({
        "event_id": pa.array(range(len(ts_ns)), pa.int64()),
        "ts": pa.array(ts_ns, pa.timestamp("ns")),
    })
    papq.write_table(
        t, str(base / "events.parquet"),
        coerce_timestamps=None, store_schema=False,
    )
    return str(base)


def test_nanos_fixture_is_really_nanos(nanos_dir):
    schema = papq.read_schema(f"{nanos_dir}/events.parquet")
    assert schema.field("ts").type == pa.timestamp("ns")


def test_nanos_branch_filters_exact_edges(spark, nanos_dir):
    df = load_table(
        spark, nanos_dir, "events",
        ts_between=("2024-01-05 00:00:00", "2024-01-20 00:00:00"),
    )
    ids = sorted(r.event_id for r in df.select("event_id").collect())
    assert ids == [1, 2, 3, 4]
    # and the derived column is a usable timestamp, not a bigint
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"


def test_nanos_branch_range_pushes_on_bigint(spark, nanos_dir):
    df = load_table(
        spark, nanos_dir, "events",
        ts_between=("2024-01-05 00:00:00", "2024-01-20 00:00:00"),
    )
    plan = _plan(df)
    assert "GreaterThanOrEqual(ts" in plan
    assert "LessThanOrEqual(ts" in plan
