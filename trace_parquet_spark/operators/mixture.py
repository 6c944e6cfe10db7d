"""Domain-mixture sampling: downsample each source so the output
corpus hits a target mixture, at the largest size the inputs allow —
the "data mixing" stage of an LLM training pipeline (upweight curated
sources, cap web crawl), expressed deterministically so re-runs and
engines agree row-for-row.

Math (all exact integers, shared with the oracle): target weights
w_s (here derived from the source id: (id mod 4) + 1, standing in for
a mixing config), W = Σw_s. The largest virtual corpus honoring the
mixture is scale = min_s floor(n_s · W / w_s); each source then keeps
~scale·w_s/W rows via the deterministic per-mille hash threshold
t_s = floor(scale · w_s · 1000 / (W · n_s)) — accept iff
h(doc_id) mod 1000 < t_s, with the repo's md5-family hash
(functions/hashing.py), so the kept SET (not just the count) is
reproducible and joinable across tables.

Scale: one aggregation for the per-source counts (tiny relation —
sources number in the hundreds), broadcast back; the corpus pass is a
single filter, no shuffle of the big table at all. Threshold
quantization to 1/1000 bounds mixture error at 0.1% per source —
tighten the denominator for finer control at no extra cost.

Reference: no counterpart (single-query engine); north-star LLM-data
infrastructure alongside sampling.py's flat hash sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash32, stable_hash32_sql
from ..sources.registry import load_table
from ..session import track_cache

MILLE = 1000

_W_SPARK = "(cast(substring(source, 4, 8) as int) % 4) + 1"
_W_DUCK = "(CAST(substring(source, 4, 8) AS INTEGER) % 4) + 1"


def mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture-sampling report: input size, the per-mille
    acceptance threshold that realizes the target mixture, and the
    kept count under the deterministic hash."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # tiny (one row per source) but feeds four plan branches: cache so
    # the documents aggregation runs once
    srcs = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_input"))
        .select("source", "n_input", F.expr(_W_SPARK).cast("long").alias("w"))
        .transform(track_cache)
    )
    totals = srcs.agg(F.sum("w").alias("big_w"))
    scaled = srcs.join(F.broadcast(totals)).select(
        "source",
        "n_input",
        "w",
        "big_w",
        F.expr("(n_input * big_w) div w").alias("cap"),
    )
    scale = scaled.agg(F.min("cap").alias("scale"))
    thresh = scaled.join(F.broadcast(scale)).select(
        "source",
        "n_input",
        F.expr(f"(scale * w * {MILLE}) div (big_w * n_input)").alias(
            "thresh_millis"
        ),
    )
    kept = (
        docs.join(F.broadcast(thresh), "source")
        .filter(
            stable_hash32(F.col("doc_id").cast("string")) % MILLE
            < F.col("thresh_millis")
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        thresh.join(F.broadcast(kept), "source", "left")
        .select(
            "source",
            "n_input",
            "thresh_millis",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


MIXTURE_SQL = f"""
WITH srcs AS (
  SELECT source, count(*) AS n_input,
         CAST({_W_DUCK} AS BIGINT) AS w
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(w) AS BIGINT) AS big_w FROM srcs
), scaled AS (
  SELECT s.*, t.big_w, (s.n_input * t.big_w) // s.w AS cap
  FROM srcs s CROSS JOIN tot t
), sc AS (
  SELECT min(cap) AS scale FROM scaled
), thresh AS (
  SELECT source, n_input,
         CAST((sc.scale * w * {MILLE}) // (big_w * n_input) AS BIGINT)
           AS thresh_millis
  FROM scaled CROSS JOIN sc
), kept AS (
  SELECT d.source, count(*) AS n_kept
  FROM documents d JOIN thresh t ON d.source = t.source
  WHERE {stable_hash32_sql("CAST(d.doc_id AS VARCHAR)")} % {MILLE}
        < t.thresh_millis
  GROUP BY d.source
)
SELECT t.source,
       CAST(t.n_input AS BIGINT)       AS n_input,
       t.thresh_millis,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM thresh t LEFT JOIN kept k ON t.source = k.source
ORDER BY t.source
"""


TEMP_BUDGET_DIV = 2  # sample half the corpus at the tempered mixture


def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-corpus
    standard, mC4/PaLM style): sampling weight w_s ∝ n_s^α with
    α = 1/2, which upweights small sources relative to proportional
    sampling. Cross-engine exactness: IEEE sqrt is correctly rounded
    in both engines, so w_s = floor(sqrt(n_s)·1000) is bit-stable,
    and everything after it is integer arithmetic — target_s =
    min(n_s, B·w_s div W) for budget B = total div 2, realized by the
    same deterministic per-mille doc_id-hash threshold as
    mixture_sample_docs (the kept SET is reproducible, not just the
    counts). upweight_ppm records each source's tempered share over
    its proportional share.

    Scale: identical plan shape to mixture_sample_docs — one
    per-source aggregation, broadcast thresholds, one filter pass."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    srcs = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_input"))
        .select(
            "source",
            "n_input",
            F.floor(F.sqrt(F.col("n_input")) * MILLE)
            .cast("long")
            .alias("w"),
        )
        .transform(track_cache)
    )
    totals = srcs.agg(
        F.sum("w").alias("big_w"), F.sum("n_input").alias("n_total")
    )
    thresh = srcs.join(F.broadcast(totals)).select(
        "source",
        "n_input",
        "w",
        F.least(
            F.col("n_input"),
            F.expr(f"((n_total div {TEMP_BUDGET_DIV}) * w) div big_w"),
        ).alias("target"),
        F.col("n_total"),
    ).select(
        "source",
        "n_input",
        "target",
        F.expr(f"(target * {MILLE}) div n_input").alias("thresh_millis"),
        F.expr("(target * n_total * 1000000) div (n_input * (n_total div "
               f"{TEMP_BUDGET_DIV}))").alias("upweight_ppm"),
    )
    kept = (
        docs.join(F.broadcast(thresh), "source")
        .filter(
            stable_hash32(F.col("doc_id").cast("string")) % MILLE
            < F.col("thresh_millis")
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        thresh.join(F.broadcast(kept), "source", "left")
        .select(
            "source",
            F.col("n_input").cast("long").alias("n_input"),
            F.col("target").cast("long").alias("target"),
            F.col("thresh_millis").cast("long").alias("thresh_millis"),
            F.col("upweight_ppm").cast("long").alias("upweight_ppm"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


TEMPERATURE_SQL = f"""
WITH srcs AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_input,
         CAST(floor(sqrt(count(*)) * {MILLE}) AS BIGINT) AS w
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(w) AS BIGINT) AS big_w,
         CAST(sum(n_input) AS BIGINT) AS n_total
  FROM srcs
), thresh AS (
  SELECT s.source, s.n_input,
         least(s.n_input,
               ((t.n_total // {TEMP_BUDGET_DIV}) * s.w) // t.big_w) AS target,
         t.n_total
  FROM srcs s CROSS JOIN tot t
), th AS (
  SELECT source, n_input, target,
         (target * {MILLE}) // n_input AS thresh_millis,
         (target * n_total * 1000000)
           // (n_input * (n_total // {TEMP_BUDGET_DIV})) AS upweight_ppm
  FROM thresh
), kept AS (
  SELECT d.source, count(*) AS n_kept
  FROM documents d JOIN th t ON d.source = t.source
  WHERE {stable_hash32_sql("CAST(d.doc_id AS VARCHAR)")} % {MILLE}
        < t.thresh_millis
  GROUP BY d.source
)
SELECT t.source,
       CAST(t.n_input AS BIGINT) AS n_input,
       CAST(t.target AS BIGINT) AS target,
       CAST(t.thresh_millis AS BIGINT) AS thresh_millis,
       CAST(t.upweight_ppm AS BIGINT) AS upweight_ppm,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM th t LEFT JOIN kept k ON t.source = k.source
ORDER BY t.source
"""


QUERIES = {
    "mixture_sample_docs": mixture_sample_docs,
    "temperature_mixture_sample": temperature_mixture_sample,
}
ORACLES = {
    "mixture_sample_docs": MIXTURE_SQL,
    "temperature_mixture_sample": TEMPERATURE_SQL,
}
