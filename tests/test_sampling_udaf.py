"""Sampling bounds (RNG variants are engine-specific → statistical
tests, not oracles) and the applyInPandas UDAF edge cases."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from trace_parquet_spark.operators.sampling import (
    hash_sample,
    rng_sample,
    stratified_sample,
)
from trace_parquet_spark.operators.udaf import user_value_trend
from trace_parquet_spark.sources.registry import load_table


def test_rng_sample_fraction_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    got = rng_sample(ev, 0.2, seed=42).count()
    assert 0.1 * n < got < 0.3 * n
    # same seed+input → reproducible within a session
    assert rng_sample(ev, 0.2, seed=42).count() == got


def test_stratified_sample_rates(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    frac = {"click": 0.5, "purchase": 1.0}
    out = stratified_sample(ev, "event_type", frac, seed=7)
    counts = {r.event_type: r.n for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    base = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert counts.get("purchase") == base["purchase"]          # rate 1.0 exact
    assert 0.3 * base["click"] < counts.get("click", 0) < 0.7 * base["click"]
    assert "view" not in counts                                 # unlisted → rate 0


def test_hash_sample_is_stable_and_joinable(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = {r.event_id for r in hash_sample(ev, "event_id").select("event_id").collect()}
    b = {r.event_id for r in hash_sample(ev, "event_id").select("event_id").collect()}
    assert a == b and len(a) > 0   # deterministic across runs


def test_trend_degenerate_groups(spark):
    # one event → denominator 0 → slope 0.0; two equal-x events too
    df = spark.createDataFrame(
        [
            (1, 100, datetime(2024, 1, 1, 0, 0, 0), 5.0),
            (2, 101, datetime(2024, 1, 2, 0, 0, 0), 1.0),
            (2, 102, datetime(2024, 1, 2, 0, 0, 0), 9.0),
            (3, 103, datetime(2024, 1, 1, 0, 0, 0), 0.0),
            (3, 104, datetime(2024, 1, 1, 0, 1, 40), 10.0),
        ],
        "user_id long, event_id long, ts timestamp, value double",
    )
    df.createOrReplaceTempView("tiny_events")
    from trace_parquet_spark.operators import udaf as U

    pts = df.select(
        "user_id",
        (F.col("ts").cast("long") - F.lit(U.EPOCH_2024)).alias("x"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    out = {
        r.user_id: r.slope_per_sec
        for r in pts.groupBy("user_id")
        .applyInPandas(U._trend, schema="user_id long, n_events long, slope_per_sec double")
        .collect()
    }
    assert out[1] == 0.0 and out[2] == 0.0
    assert abs(out[3] - 0.1) < 1e-12   # 10 value units over 100 s
