"""End-to-end entity resolution: blocking → pairwise match → cluster →
canonicalize, composed from this repo's existing primitives the way
corpus_clean composes the dedup stages.

Stages (all reused, so every scale property is inherited):
1. Candidate pairs: plans/relational_extras.fuzzy_part_pairs — q-gram
   count-filter blocking (lossless for the edit-distance threshold),
   levenshtein only on candidates.
2. Clustering: operators/dedup_clusters.connected_components — min-
   label propagation with per-iteration checkpointing.
3. Canonicalization: cluster representative = min key (deterministic
   survivorship rule), members serialized as a sorted '|'-joined
   string so the driver canonicalizer can hash the row flat.

Only multi-member entities are emitted (components are defined over
edge-touching nodes); unmatched records are already canonical and a
production merge would union them back untouched.

The DuckDB oracle recomputes the same thing independently: exact
all-pairs levenshtein for the edges and a WITH RECURSIVE reachability
closure for the components — so the gate checks the blocking's
losslessness AND the label-propagation fixpoint against a from-first-
principles transitive closure.

Reference: no counterpart (single-query engine); north-star
data-integration infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.relational_extras import (
    FUZZY_EDIT_MAX,
    FUZZY_KEY_MAX,
    fuzzy_part_pairs,
)
from ..sources.registry import load_table
from .dedup_clusters import connected_components


def resolve_part_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-matched part-name entities: one row per resolved entity
    with the canonical record and the sorted member list."""
    edges = fuzzy_part_pairs(spark, sf_dir).select(
        F.col("key_a").alias("src"), F.col("key_b").alias("dst")
    )
    labels = connected_components(edges)
    clusters = (
        labels.groupBy(F.col("cluster_id").alias("canonical_key"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.array_join(
                F.sort_array(
                    F.collect_list(F.col("doc_id").cast("string"))
                ),
                "|",
            ).alias("member_keys"),
        )
    )
    names = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("canonical_key"),
        F.col("p_name").alias("canonical_name"),
    )
    return (
        # no broadcast hint: the name dimension scales with part;
        # equi-join on the canonical key lets Spark choose by size
        clusters.join(names, "canonical_key")
        .select("canonical_key", "canonical_name", "n_members", "member_keys")
        .orderBy("canonical_key")
    )


# NB: collect_list gathers STRING-cast keys, so member_keys sorts
# lexicographically; the oracle mirrors with ORDER BY CAST AS VARCHAR.
RESOLVE_SQL = f"""
WITH RECURSIVE scoped AS (
  SELECT p_partkey, p_name FROM part WHERE p_partkey < {FUZZY_KEY_MAX}
), pairs AS (
  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b
  FROM scoped a JOIN scoped b ON a.p_partkey < b.p_partkey
  WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_EDIT_MAX}
), sym AS (
  SELECT key_a AS src, key_b AS dst FROM pairs
  UNION
  SELECT key_b AS src, key_a AS dst FROM pairs
), reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
  WHERE r.src <> s.dst
), lbl AS (
  SELECT src AS member_key,
         least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
)
SELECT l.cluster_id                                   AS canonical_key,
       p.p_name                                       AS canonical_name,
       CAST(count(*) AS BIGINT)                       AS n_members,
       string_agg(CAST(l.member_key AS VARCHAR), '|'
                  ORDER BY CAST(l.member_key AS VARCHAR)) AS member_keys
FROM lbl l JOIN part p ON p.p_partkey = l.cluster_id
GROUP BY l.cluster_id, p.p_name
ORDER BY canonical_key
"""


QUERIES = {"resolve_part_entities": resolve_part_entities}
ORACLES = {"resolve_part_entities": RESOLVE_SQL}
