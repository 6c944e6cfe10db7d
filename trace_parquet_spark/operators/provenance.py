"""Cross-source contamination / provenance analysis.

``source_overlap_matrix`` measures n-gram (shingle) overlap between
every pair of sources: how much of source A's content also appears in
source B — the source-granular generalization of eval-set
decontamination (operators/hygiene.py), used to detect mirror sites,
cross-split leakage, and wholesale copying between corpus components
before mixing weights are chosen.

Shape: the df-capped shingle relation (shared with dedup — hot
boilerplate shingles are excluded, which both bounds the fan-out AND
stops navigation chrome from counting as "overlap") is lifted to
(source, shingle) pairs, grouped per shingle into its sorted source
set, and each set's C(k, 2) ordered pairs are exploded map-side — k
is bounded by the SOURCE count (small by definition: corpus
components number in the hundreds), never by document count, and the
relation is scanned once (no shingle self-join). Output is per
ordered source pair: shared-shingle count and an exact integer
Jaccard micro-ratio.

Reference: no counterpart; north-star LLM-pipeline extension
alongside operators/hygiene.py (eval decontamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from ..session import track_cache
from .dedup import SHINGLE_DF_CAP, _doc_shingles_capped, _SHINGLES_CTE


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles_capped(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ssrc = sh.join(src, "doc_id").select("source", "s").transform(track_cache)
    # cache: sizes and the pair explode both consume it; without the
    # cache the whole shingle+df-cap chain runs twice (self-join-style
    # plan aliasing gets no cross-subtree reuse from Catalyst)
    sizes = ssrc.distinct().groupBy("source").agg(F.count("*").alias("n_sh"))
    # One pass instead of a shingle self-join: collect each shingle's
    # (sorted, distinct) source set and explode its C(k,2) ordered
    # pairs map-side — k is bounded by the SOURCE count, so the
    # explode is small by construction and the upstream relation is
    # read once.
    inter = (
        ssrc.groupBy("s")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (x, i) ->"
                    " transform(slice(srcs, i + 2, size(srcs)),"
                    " y -> struct(x AS source_a, y AS source_b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.source_a").alias("source_a"), F.col("p.source_b").alias("source_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(F.col("source").alias("source_a"), F.col("n_sh").alias("na"))
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("source").alias("source_b"), F.col("n_sh").alias("nb"))
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.expr("(n_shared * 1000000) div (na + nb - n_shared)").alias(
                "jaccard_micro"
            ),
        )
        .orderBy("source_a", "source_b")
    )


SOURCE_OVERLAP_SQL = f"""
WITH {_SHINGLES_CTE},
ssrc AS (
  SELECT DISTINCT d.source, sh.s
  FROM sh JOIN documents d ON sh.doc_id = d.doc_id
),
sizes AS (
  SELECT source, count(*) AS n_sh FROM ssrc GROUP BY source
),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM ssrc a JOIN ssrc b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b,
       CAST(i.n_shared AS BIGINT) AS n_shared,
       CAST((i.n_shared * 1000000) // (x.n_sh + y.n_sh - i.n_shared)
            AS BIGINT) AS jaccard_micro
FROM inter i
JOIN sizes x ON i.source_a = x.source
JOIN sizes y ON i.source_b = y.source
ORDER BY source_a, source_b
"""


QUERIES = {"source_overlap_matrix": source_overlap_matrix}
ORACLES = {"source_overlap_matrix": SOURCE_OVERLAP_SQL}
