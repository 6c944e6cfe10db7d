"""Sketch invariants that the driver's oracle gate cannot see:

- merge associativity — building a sketch from per-split partials and
  combining them (add / bottom-k-of-union / element-wise max) yields
  the identical sketch to one global pass. This is the property that
  makes each sketch a valid tree-aggregation partial at cluster scale.
- estimator guarantees — CMS never undercounts; KMV/HLL estimates are
  exact when the group is smaller than the sketch resolution.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trace_parquet_spark.functions.hashing import stable_hash32, stable_hash32_x4
from trace_parquet_spark.operators import sketches
from trace_parquet_spark.sources.registry import load_table


def _events_split(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_id") % 2 == 0), ev.where(F.col("event_id") % 2 == 1)


def _cms_matrix(df):
    h = stable_hash32_x4(F.col("user_id").cast("string"), sketches.CMS_SEED)
    rows = (
        df.select(F.explode(sketches._cms_pairs(h, sketches.CMS_WIDTH)).alias("jb"))
        .groupBy("jb.j", "jb.bucket")
        .agg(F.count("*").cast("long").alias("c"))
        .collect()
    )
    return {(r["j"], r["bucket"]): r["c"] for r in rows}


def test_cms_partials_add_to_global(spark, sf_dir):
    a, b = _events_split(spark, sf_dir)
    whole = _cms_matrix(load_table(spark, sf_dir, "events"))
    pa, pb = _cms_matrix(a), _cms_matrix(b)
    merged = {
        k: pa.get(k, 0) + pb.get(k, 0) for k in set(pa) | set(pb)
    }
    assert merged == whole


def test_cms_never_undercounts(spark, sf_dir):
    out = sketches.cms_user_event_counts(spark, sf_dir).collect()
    assert out, "no rows"
    assert all(r["overcount"] >= 0 for r in out)
    assert all(r["cms_est"] >= r["n_exact"] for r in out)


def _kmv_bottom(df):
    h = stable_hash32(
        F.concat(F.col("event_type"), F.lit(":"), F.col("user_id").cast("string"))
    )
    rows = df.select(h.alias("h")).distinct().orderBy("h").limit(sketches.KMV_K)
    return [r["h"] for r in rows.collect()]


def test_kmv_merge_is_bottom_k_of_union(spark, sf_dir):
    a, b = _events_split(spark, sf_dir)
    whole = _kmv_bottom(load_table(spark, sf_dir, "events"))
    merged = sorted(set(_kmv_bottom(a)) | set(_kmv_bottom(b)))[: sketches.KMV_K]
    assert merged == whole


def test_kmv_exact_below_k(spark, sf_dir):
    out = {
        r["event_type"]: r
        for r in sketches.kmv_distinct_sketch(spark, sf_dir).collect()
    }
    assert out
    for r in out.values():
        if r["n_exact"] < sketches.KMV_K:
            assert r["kmv_est"] == r["n_exact"]


def _hll_registers(df):
    h = stable_hash32(
        F.concat(F.col("event_type"), F.lit("#"), F.col("user_id").cast("string"))
    )
    rows = (
        df.select(h.alias("h"))
        .distinct()
        .select(
            F.pmod("h", F.lit(sketches.HLL_M)).alias("idx"),
            F.expr(f"h div {sketches.HLL_M}").alias("w"),
        )
        .select(
            "idx",
            F.when(F.col("w") == 0, F.lit(27))
            .otherwise(F.lit(27) - F.length(F.bin("w")))
            .alias("rank"),
        )
        .groupBy("idx")
        .agg(F.max("rank").alias("m"))
        .collect()
    )
    return {r["idx"]: r["m"] for r in rows}


def test_hll_registers_merge_by_max(spark, sf_dir):
    a, b = _events_split(spark, sf_dir)
    whole = _hll_registers(load_table(spark, sf_dir, "events"))
    pa, pb = _hll_registers(a), _hll_registers(b)
    merged = {k: max(pa.get(k, 0), pb.get(k, 0)) for k in set(pa) | set(pb)}
    assert merged == whole


def test_hll_rank_bounds(spark, sf_dir):
    regs = _hll_registers(load_table(spark, sf_dir, "events"))
    assert regs
    assert all(1 <= m <= 27 for m in regs.values())


def test_histogram_partials_add_and_estimate_within_bin(spark, sf_dir):
    from trace_parquet_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    mn, mx = li.agg(F.min("cents"), F.max("cents")).first()
    width = (mx - mn) // sketches.HIST_BINS + 1

    def hist(df):
        rows = (
            df.select(F.expr(f"(cents - {mn}) div {width}").alias("bin"))
            .groupBy("bin")
            .count()
            .collect()
        )
        return {r["bin"]: r["count"] for r in rows}

    a = hist(li.where(F.col("cents") % 2 == 0))
    b = hist(li.where(F.col("cents") % 2 == 1))
    whole = hist(li)
    merged = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert merged == whole

    out = sketches.histogram_quantile_sketch(spark, sf_dir).collect()
    assert len(out) == 3 * len(sketches.HIST_PS)
    for r in out:
        assert abs(r["err_cents"]) <= width, r
