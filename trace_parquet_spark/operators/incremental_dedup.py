"""Incremental MinHash dedup: screen a NEW batch of documents against
an existing corpus without re-pairing the history.

Production shape: the history's banded MinHash signatures live in a
fingerprint store (they are a few dozen bytes per doc — the only
state the pipeline keeps); each arriving batch computes signatures
for ITS docs only, band-joins **delta × store** (never store ×
store — history never re-pairs against itself), and exact-verifies
the candidate pairs. Cost per batch is O(|delta| + collisions), not
O(|corpus|²): this is how a 100 TB corpus absorbs daily crawl drops.

Here the "store" is derived on the fly by splitting ``documents`` at
a data-derived cutoff (first 90% of the id range = history, last 10%
= the arriving batch), so the driver oracle can replay the exact same
split. Signature math, the df-capped shingle universe, and the
candidate-verification join are shared with operators/dedup.py —
the incremental variant differs ONLY in the band join's asymmetry,
which is precisely the claim worth testing.

Output: one row per (new doc, history doc) near-dup hit — the new
docs to drop (or link) before ingestion.

Reference: no counterpart (SURVEY.md §2.4 — no aggregations exist);
north-star LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table_parallel
from ..session import track_cache
from .dedup import (
    SHINGLE_DF_CAP,
    _band_signatures,
    _doc_shingles,
    _meets_threshold,
    _meets_threshold_sql,
    _minhash_cte,
    _shingles_of,
    _SHINGLES_CTE,
    minhash_signatures,
)

CUT_NUM = 9
CUT_DEN = 10


def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch near-dups of history docs: (doc_new, dup_of, jaccard)."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    cut = docs.agg(
        F.expr(f"((max(doc_id) + 1) * {CUT_NUM}) div {CUT_DEN}").alias("c")
    )

    sh_full = _doc_shingles(spark, sf_dir)
    hot = (
        sh_full.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("s")
        .transform(track_cache)  # tiny; signatures and verification must agree on it
    )
    sh_capped = sh_full.join(hot, "s", "left_anti")
    bands = _band_signatures(minhash_signatures(sh_capped)).crossJoin(
        F.broadcast(cut)
    )
    # The asymmetry that makes it incremental: history bands on one
    # side, delta bands on the other. No forced broadcast — a delta
    # scales with micro-batch size, not a constant (a backfill batch
    # of millions of docs would blow a forced-broadcast relation past
    # executor memory); under AQE a genuinely-small delta still
    # broadcasts at runtime from its observed size, and an oversized
    # one degrades gracefully to a shuffle band join on
    # (band_id, band_sig) instead of OOMing the executors.
    old_b = bands.filter(F.col("doc_id") < F.col("c")).drop("c")
    new_b = bands.filter(F.col("doc_id") >= F.col("c")).drop("c")
    candidates = (
        old_b.alias("a")
        .join(
            new_b.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .transform(track_cache)  # feeds both candidate-doc pruning and the final join
    )
    # candidate id-sets scale with collision count (dup-heavy corpora)
    # — no forced broadcast; size/AQE decides
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    docs_c = docs.join(cand_docs, "doc_id", "left_semi")
    # candidate shingles feed three consumers (both verification join
    # sides and the size aggregation) and are bounded by collision
    # count — cached, same rule as _minhash_pairs (round-14, §1.2)
    sh_c = track_cache(_shingles_of(docs_c).join(hot, "s", "left_anti"))
    ca = sh_c.alias("ca")
    cb = sh_c.alias("cb")
    # candidate-pair restriction BEFORE the aggregation — verification
    # work stays bounded by candidate count even when candidate docs
    # co-pair densely (pure restriction: inter ⊆ candidates after it)
    inter = (
        ca.join(
            cb,
            (F.col("ca.s") == F.col("cb.s"))
            & (F.col("ca.doc_id") < F.col("cb.doc_id")),
        )
        .select(
            F.col("ca.doc_id").alias("doc_a"), F.col("cb.doc_id").alias("doc_b")
        )
        .join(candidates, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = sh_c.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    jac = F.col("n_inter") / (F.col("sa") + F.col("sb") - F.col("n_inter"))
    verified = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sa")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sb")),
            "doc_b",
        )
        .filter(_meets_threshold())
        .withColumn("jaccard", F.round(jac, 6))
    )
    return (
        verified.select(
            F.col("doc_b").alias("doc_new"),
            F.col("doc_a").alias("dup_of"),
            "jaccard",
        )
        .orderBy("doc_new", "dup_of")
    )


# History ids are always < cutoff <= new ids, so every (history, new)
# pair already satisfies the symmetric candidates CTE's doc_a < doc_b;
# the incremental split is one extra filter over the shared CTE chain.
INCREMENTAL_MINHASH_SQL = f"""
WITH {_SHINGLES_CTE},
{_minhash_cte()},
cut AS (
  SELECT ((max(doc_id) + 1) * {CUT_NUM}) // {CUT_DEN} AS c FROM documents
),
inc AS (
  SELECT doc_a, doc_b FROM candidates, cut
  WHERE doc_a < c AND doc_b >= c
),
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
exact AS (
  SELECT doc_a, doc_b,
         round(n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter), 6) AS jaccard
  FROM inter
  JOIN sz x ON doc_a = x.doc_id
  JOIN sz y ON doc_b = y.doc_id
  WHERE {_meets_threshold_sql("x.n_sh", "y.n_sh")}
)
SELECT c.doc_b AS doc_new, c.doc_a AS dup_of, e.jaccard
FROM inc c JOIN exact e ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
ORDER BY doc_new, dup_of
"""


QUERIES = {"dedup_incremental_minhash": dedup_incremental_minhash}
ORACLES = {"dedup_incremental_minhash": INCREMENTAL_MINHASH_SQL}
