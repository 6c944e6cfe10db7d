"""Sampling for training-data pipelines.

Two families:

- **hash sampling** (`hash_sample_events`): deterministic, reproducible,
  engine-independent — sample iff ``h(key) mod M < k``. This is what a
  100 TB pipeline actually wants (re-runs select the same rows, the
  sample is joinable across tables sharing the key) and it is fully
  oracle-checkable.
- **RNG sampling** (`rng_sample`, `stratified_sample`): Spark's native
  ``sample``/``sampleBy`` (Bernoulli per-partition RNG). Engine-
  specific by nature → no oracle; pytest asserts statistical bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash32, stable_hash32_sql
from ..sources.registry import load_table

SAMPLE_PCT = 10  # keep h % 100 < 10 → 10% deterministic sample


def hash_sample(df: DataFrame, key_col: str, pct: int = SAMPLE_PCT) -> DataFrame:
    return df.filter(
        stable_hash32(F.col(key_col).cast("string")) % 100 < pct
    )


def hash_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        hash_sample(ev, "event_id")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.sum("value"), 2).alias("sampled_value"),
        )
        .orderBy("event_type")
    )


HASH_SAMPLE_SQL = f"""
SELECT event_type,
       count(*) AS n_sampled,
       round(sum(value), 2) AS sampled_value
FROM events
WHERE {stable_hash32_sql("CAST(event_id AS VARCHAR)")} % 100 < {SAMPLE_PCT}
GROUP BY event_type
ORDER BY event_type
"""


def rng_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Spark-native Bernoulli sample (per-partition RNG; reproducible
    for a fixed seed AND partitioning, not across engines)."""
    return df.sample(fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downsample the dominant class)."""
    return df.sampleBy(strata_col, fractions, seed=seed)


QUERIES = {"hash_sample_events": hash_sample_events}
ORACLES = {"hash_sample_events": HASH_SAMPLE_SQL}
