"""Round-12 pins: the 64-bit SimHash scale twin (Manku-Jain-Sarma
2007 chunk widths — closes the round-11 30×-probe superlinearity
finding on simhash_hamming_pairs), the ChunkSpaceHint pointing the
32-bit anchor at it, and the scale-hint hardening from the round-11
advice (call-time env read, sizing-source validation, parquet-footer
short-circuit)."""

from __future__ import annotations

import warnings as w

import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.operators import scale_hints
from trace_parquet_spark.operators.dedup import (
    HAM64_CHUNKS,
    HAM64_MAX,
    simhash64_docs,
    simhash64_hamming_pairs,
    simhash_hamming_pairs,
)


# ------------------------- 64-bit SimHash twin


def test_simhash64_signature_uses_full_width(spark, sf_dir):
    """Signatures must actually populate the upper 32 bits (including
    the sign bit carried as bit 63) — a twin that silently computed
    32-bit signatures would pass the pairs oracle while keeping the
    256-value chunk space it exists to escape."""
    sims = simhash64_docs(spark, sf_dir)
    stats = sims.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("simhash64") < 0, 1).otherwise(0)).alias(
            "n_negative"
        ),
        F.sum(
            F.when(
                F.shiftright(F.col("simhash64"), 32).bitwiseAND((1 << 32) - 1)
                != 0,
                1,
            ).otherwise(0)
        ).alias("n_upper_set"),
    ).first()
    assert stats.n > 0
    # ~half of random signatures set the sign bit; require a healthy
    # fraction rather than an exact split
    assert stats.n_negative > stats.n * 0.2
    assert stats.n_upper_set > stats.n * 0.9


def test_simhash64_pigeonhole_recall_is_exact(spark, sf_dir):
    """The 4×16-bit chunk blocking must find EXACTLY the all-pairs
    ≤HAM64_MAX set (pigeonhole: 3 flips touch ≤3 of 4 chunks). The
    driver oracle proves this vs DuckDB; this pin proves it
    in-engine against a Spark all-pairs derivation, so a blocking
    regression fails fast in pytest."""
    sims = simhash64_docs(spark, sf_dir).collect()
    expected = set()
    for i, ra in enumerate(sims):
        for rb in sims[i + 1 :]:
            x = (ra.simhash64 ^ rb.simhash64) & ((1 << 64) - 1)
            if bin(x).count("1") <= HAM64_MAX:
                pair = (
                    min(ra.doc_id, rb.doc_id),
                    max(ra.doc_id, rb.doc_id),
                )
                expected.add(pair)
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash64_hamming_pairs(spark, sf_dir).collect()
    }
    assert got == expected


def test_simhash64_chunks_cover_the_word():
    """4 × 16 must cover all 64 bits and support radius CHUNKS-1."""
    assert HAM64_CHUNKS * 16 == 64
    assert HAM64_MAX == HAM64_CHUNKS - 1


def test_simhash32_anchor_hints_at_64bit_twin(spark, sf_dir, monkeypatch):
    """Past the chunk-space factor the 32-bit anchor must emit a
    ChunkSpaceHint naming simhash64_hamming_pairs; at the default
    factor it stays silent at test SF (500 docs ≤ 32×256)."""
    monkeypatch.setenv("SPARK_GRAFT_CHUNK_HINT_FACTOR", "1")
    # 500 docs > 1×256 -> fires (env read at call time, chunk space 256)
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        simhash_hamming_pairs(spark, sf_dir).take(1)
    hints = [
        c
        for c in caught
        if issubclass(c.category, scale_hints.ChunkSpaceHint)
    ]
    assert hints, "32-bit anchor emitted no ChunkSpaceHint"
    assert "simhash64_hamming_pairs" in str(hints[0].message)
    monkeypatch.delenv("SPARK_GRAFT_CHUNK_HINT_FACTOR")
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        simhash_hamming_pairs(spark, sf_dir).take(1)
    assert not [
        c
        for c in caught
        if issubclass(c.category, scale_hints.ChunkSpaceHint)
    ]


# ------------------------- scale-hint hardening (round-11 advice)


def test_warn_if_window_heavy_requires_a_sizing_source():
    """No known_rows, no df, no table_path -> a clear ValueError, not
    an AttributeError from df.count() on None."""
    with pytest.raises(ValueError, match="sizing source"):
        scale_hints.warn_if_window_heavy("op", "twin")


def test_scale_hint_env_is_read_at_call_time(monkeypatch):
    """SPARK_GRAFT_SCALE_HINT_ROWS set AFTER import must take effect
    (the round-11 advice: it was read once at module import)."""
    monkeypatch.setenv("SPARK_GRAFT_SCALE_HINT_ROWS", "0")
    # limit 0 disables: returns None without touching the (absent) df
    assert (
        scale_hints.warn_if_window_heavy("op", "twin", known_rows=10**12)
        is None
    )
    monkeypatch.setenv("SPARK_GRAFT_SCALE_HINT_ROWS", "5")
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        scale_hints.warn_if_window_heavy("op", "twin", known_rows=6)
    assert [
        c
        for c in caught
        if issubclass(c.category, scale_hints.WindowScaleHint)
    ]


def test_footer_short_circuit_skips_the_spark_probe(sf_dir):
    """A table whose footer row count is at or under the limit must
    short-circuit WITHOUT a Spark job: passing df=None alongside
    table_path proves no probe ran (it would raise otherwise)."""
    out = scale_hints.warn_if_window_heavy(
        "op",
        "twin",
        table_path=f"{sf_dir}/documents.parquet",
        threshold=10**9,
    )
    assert out is None  # skipped: footer bound <= limit, no Spark job


def test_footer_used_as_global_window_size(sf_dir):
    """Above the limit with no df, the footer count itself sizes a
    global window and the hint fires."""
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        n = scale_hints.warn_if_window_heavy(
            "op",
            "twin",
            table_path=f"{sf_dir}/documents.parquet",
            threshold=1,
        )
    assert n and n > 1
    assert [
        c
        for c in caught
        if issubclass(c.category, scale_hints.WindowScaleHint)
    ]
