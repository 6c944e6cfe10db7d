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

from ..functions.money import money_sum

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
            money_sum("value").alias("sampled_value"),
        )
        .orderBy("event_type")
    )


HASH_SAMPLE_SQL = f"""
SELECT event_type,
       count(*) AS n_sampled,
       (CAST(sum(CAST(round((value) * 100) AS BIGINT)) AS DOUBLE) / 100) AS sampled_value
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


STRATA_PCT_EN = 10   # downsample the dominant language
STRATA_PCT_OTHER = 50


def stratified_hash_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic STRATIFIED sampling: per-stratum rates via the
    hash rule (en docs kept at 10%, other languages at 50% — the
    rebalancing move every multilingual corpus needs), reproducible
    and engine-independent unlike RNG sampleBy. Per-stratum counts and
    id extrema evidence the exact selected set."""
    docs = load_table(spark, sf_dir, "documents")
    pct = F.when(F.col("lang") == "en", F.lit(STRATA_PCT_EN)).otherwise(
        F.lit(STRATA_PCT_OTHER)
    )
    kept = docs.filter(
        stable_hash32(F.col("doc_id").cast("string")) % 100 < pct
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


STRATIFIED_SQL = f"""
SELECT lang,
       count(*) AS n_sampled,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc
FROM documents
WHERE {stable_hash32_sql("CAST(doc_id AS VARCHAR)")} % 100
      < CASE WHEN lang = 'en' THEN {STRATA_PCT_EN} ELSE {STRATA_PCT_OTHER} END
GROUP BY lang
ORDER BY lang
"""


QUERIES = {
    "hash_sample_events": hash_sample_events,
    "stratified_hash_sample_docs": stratified_hash_sample_docs,
}
ORACLES = {
    "hash_sample_events": HASH_SAMPLE_SQL,
    "stratified_hash_sample_docs": STRATIFIED_SQL,
}


# --------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# --------------------------------------------------------------------------

WEIGHTED_K = 100


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling WITHOUT replacement — the missing
    sibling of the uniform/stratified hash samplers: select K docs
    with inclusion probability ∝ n_chars (token-budget-proportional
    selection, the way a corpus sample should weight long documents).
    A-ES (Efraimidis & Spirakis 2006): each item draws u ∈ (0,1] and
    ranks by -ln(u)/w; the K smallest keys are the sample.

    Determinism discipline: u = (h+1)/2³² from the md5 hash family
    (exact double: both operands < 2⁵³), -ln(u) lands on the micro-nat
    libm-parity grid as an int64, and the rank key m/w is ONE double
    division of exact integers — bit-identical in any IEEE engine, so
    the selected set and order hash-match. Top-K via orderBy+limit
    (TakeOrderedAndProject — no global sort).

    Scale: embarrassingly parallel (a hash and two divisions per row);
    the only coordination is the top-K itself, which Spark runs as
    per-partition heaps + a K-row driver merge."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.greatest(F.col("n_chars"), F.lit(1)).alias("w")
    )
    h = stable_hash32(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")))
    u = (h + F.lit(1)).cast("double") / F.lit(4294967296.0)
    m = F.floor(-F.log(u) * F.lit(1e6) + F.lit(0.5)).cast("long")
    keyed = docs.select(
        "doc_id", "w", m.alias("key_micronat")
    ).withColumn("key", F.col("key_micronat").cast("double") / F.col("w"))
    return (
        keyed.orderBy("key", "doc_id")
        .limit(WEIGHTED_K)
        .select(
            "doc_id",
            F.col("w").cast("long").alias("weight"),
            "key_micronat",
        )
        .orderBy(
            F.col("key_micronat").cast("double") / F.col("weight"), "doc_id"
        )
    )


_WS_H = stable_hash32_sql("'ws:' || CAST(doc_id AS VARCHAR)")

WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         greatest(n_chars, 1) AS w,
         CAST(floor(-ln(CAST({_WS_H} + 1 AS DOUBLE) / 4294967296.0)
                    * 1000000 + 0.5) AS BIGINT) AS key_micronat
  FROM documents
)
SELECT doc_id,
       CAST(w AS BIGINT) AS weight,
       key_micronat
FROM keyed
ORDER BY CAST(key_micronat AS DOUBLE) / w, doc_id
LIMIT {WEIGHTED_K}
"""

QUERIES["weighted_sample_docs"] = weighted_sample_docs
ORACLES["weighted_sample_docs"] = WEIGHTED_SAMPLE_SQL
