"""Deduplication — the flagship training-data-pipeline stage.

Four flavors, each with a different scale/recall trade-off:

- **exact** (`dedup_exact`): hash-groupBy on a content fingerprint.
  One shuffle on the 128-bit hash; the canonical 100 TB first pass.
- **n-gram Jaccard** (`dedup_ngram_pairs`): exact set similarity via a
  shingle self-join over the DF-CAPPED shingle relation (shingles
  appearing in > SHINGLE_DF_CAP docs are dropped as stopword-shingles
  before any pairing — a hot boilerplate shingle shared by S docs
  would otherwise fan out S² join rows). Ground truth for LSH.
- **MinHash + LSH** (`dedup_minhash_lsh`): the scale path. 16 md5-family
  min-hashes per doc → 4 bands × 4 rows → banded bucket join only
  produces candidate pairs (collision probability s^4 per band) →
  exact Jaccard verification on candidates. All JVM-side; the band
  join shuffles only (band_id, signature) pairs.
- **SimHash** (`simhash_docs`): 32-bit bitwise-majority signature per
  doc; near-dups differ in few bits. Signature computation is one
  explode + 32 conditional sums (single aggregation pass).

Every variant is deterministic (md5 hash family from
functions/hashing.py) and has a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    fingerprint_md5,
    fingerprint_md5_sql,
    stable_hash32,
    stable_hash32_sql,
    stable_hash32_x4,
    stable_hash32_x4_sql,
)
from ..functions.text import (
    norm_text,
    norm_text_sql,
    shingles_from,
    shingles_sql,
    tokens,
    tokens_sql,
)
from ..sources.registry import load_table, load_table_parallel
from ..session import track_cache

SHINGLE_N = 3
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
JACCARD_THRESHOLD = 0.5
# JACCARD_THRESHOLD as an exact fraction: the threshold filter is the
# integer test  n_inter * DEN >= NUM * (sa + sb - n_inter)  everywhere
# (Spark and oracle alike), never a comparison on the rounded float —
# round(jaccard, 6) >= τ admits pairs with true J in [τ - 5e-7, τ)
# that candidate generation (prefix filter / LSH collision bounds) is
# only obligated to produce for true J >= τ. The rounded value is
# display-only. Same fraction drives the prefix-length arithmetic
# (ceil(n·τ) = (n·NUM + DEN - 1) div DEN).
SETSIM_NUM, SETSIM_DEN = 1, 2
assert SETSIM_NUM / SETSIM_DEN == JACCARD_THRESHOLD
# Shingles appearing in more than this many documents are dropped
# before ANY pairing/signature work (stopword-shingle rule). This is
# the scale guard: without it one boilerplate shingle shared by S
# docs makes S² pairs in the exact self-join. Semantics are mirrored
# exactly in the DuckDB oracle CTE, so parity is unaffected.
SHINGLE_DF_CAP = 100


def _meets_threshold() -> F.Column:
    """Exact threshold test on integer columns (n_inter, sa, sb):
    n_inter / (sa + sb - n_inter) >= NUM/DEN without float rounding."""
    return F.col("n_inter") * SETSIM_DEN >= F.lit(SETSIM_NUM) * (
        F.col("sa") + F.col("sb") - F.col("n_inter")
    )


# the same integer test for the DuckDB oracles (sa/sb spelled by caller)
def _meets_threshold_sql(sa: str, sb: str) -> str:
    return f"n_inter * {SETSIM_DEN} >= {SETSIM_NUM} * ({sa} + {sb} - n_inter)"


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group by content fingerprint; keep the smallest doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint_md5(norm_text("text")).alias("content_fp"))
        .groupBy("content_fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("content_fp")
    )


DEDUP_EXACT_SQL = f"""
SELECT {fingerprint_md5_sql(norm_text_sql("text"))} AS content_fp,
       min(doc_id) AS keep_doc_id,
       count(*)    AS n_copies
FROM documents
GROUP BY 1
ORDER BY content_fp
"""


# --------------------------------------------------------------------------
# shared shingle relation
# --------------------------------------------------------------------------


def _shingles_of(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct pairs for an arbitrary document
    relation. Tokens are materialized in a separate projection so the
    shingle lambda slices an attribute reference instead of
    re-splitting the text per position."""
    return docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles_from(F.col("toks"), SHINGLE_N))
        ).alias("s"),
    )


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shingles_of(load_table_parallel(spark, sf_dir, "documents", "doc_id"))


def _doc_shingles_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle relation minus hot shingles (document frequency >
    SHINGLE_DF_CAP). The hot set is the heavy-hitter tail — usually
    small (≤ |shingles|/cap), but that bound grows linearly with
    corpus token mass, so on a boilerplate-heavy 100 TB crawl it can
    reach 1e8+ shingles: NO forced broadcast — size/AQE decides (the
    streaming twin, dedup_stream.py, applies the same rule). All
    pairing, minhash signatures, and Jaccard sizes downstream use this
    capped relation, so similarity is computed over the same universe
    in both engines.
    """
    sh = _doc_shingles(spark, sf_dir)
    hot = (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("s")
    )
    return sh.join(hot, "s", "left_anti")


_SHINGLES_CTE = f"""
sh_all AS (
  SELECT DISTINCT doc_id,
         unnest({shingles_sql("text", SHINGLE_N)}) AS s
  FROM documents
),
hot AS (
  SELECT s FROM sh_all GROUP BY s HAVING count(*) > {SHINGLE_DF_CAP}
),
sh AS (
  SELECT * FROM sh_all WHERE s NOT IN (SELECT s FROM hot)
)
"""


# --------------------------------------------------------------------------
# exact n-gram Jaccard pairs
# --------------------------------------------------------------------------


def dedup_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold (exact over the
    df-capped shingle universe — see SHINGLE_DF_CAP)."""
    # cached once: feeds both join sides and the size aggregation
    sh = track_cache(_doc_shingles_capped(spark, sf_dir))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    jac = F.col("n_inter") / (F.col("sa") + F.col("sb") - F.col("n_inter"))
    return (
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
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


DEDUP_NGRAM_SQL = f"""
WITH {_SHINGLES_CTE},
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sz x ON doc_a = x.doc_id
JOIN sz y ON doc_b = y.doc_id
WHERE {_meets_threshold_sql("x.n_sh", "y.n_sh")}
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------------
# exact set-similarity join via prefix filtering (PPJoin/AllPairs family)
# --------------------------------------------------------------------------

def dedup_setsim_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT sub-quadratic set-similarity self-join via prefix
    filtering — the deterministic counterpart to MinHash-LSH: no
    recall loss, same candidate-then-verify shape.

    Theorem (AllPairs/PPJoin): under any global total order on
    shingles, two sets with Jaccard ≥ τ must collide inside each
    other's PREFIX of length |d| - ⌈τ·|d|⌉ + 1. Ordering by ASCENDING
    document frequency makes prefixes consist of the rarest shingles,
    so the prefix self-join's per-shingle fan-out is small by
    construction (and the df-cap already removed the boilerplate
    tail). Candidates = prefix-prefix collisions that additionally
    survive PPJoin's two exactness-preserving prunes, evaluated
    INSIDE the join condition (both only discard pairs provably below
    τ, so recall stays perfect):

    - length filter: J ≥ τ forces den·min(|a|,|b|) ≥ num·max(|a|,|b|);
    - positional filter: a collision at 1-based prefix positions
      (i, j) bounds the overlap by 1 + min(|a|−i, |b|−j), which must
      reach α = ⌈num·(|a|+|b|) / (num+den)⌉ (the overlap J ≥ τ
      requires).

    Exact Jaccard then verifies the surviving candidates only,
    re-shingling candidate docs exactly as dedup_minhash_lsh does.

    Because the algorithm is exact, the oracle is the plain all-pairs
    SQL (DEDUP_NGRAM_SQL) — a genuinely independent derivation that
    must hash-match; pytest additionally pins candidate count <
    all-pairs count (the pruning is real, not vacuous).

    Scale: one df aggregation, one per-doc window (partitioned by
    doc_id — never global), a self-join whose left/right are the
    prefix subset (≈ half the shingle mass, rare-shingle-weighted),
    and candidate-bounded verification. This is the 100 TB exact-dedup
    path when LSH's miss probability is not acceptable."""
    sh_full = _doc_shingles(spark, sf_dir)
    dfreq = sh_full.groupBy("s").agg(F.count("*").alias("df"))
    hot = track_cache(
        dfreq.filter(F.col("df") > SHINGLE_DF_CAP).select("s")
    )  # tiny; prefixes and verification must agree on the capped universe
    sh = sh_full.join(hot, "s", "left_anti")

    w = Window.partitionBy("doc_id").orderBy("df", "s")
    # |d| rides the SAME doc_id window shuffle as the prefix position
    # (round-14, guide §2.1): the old shape aggregated sizes
    # separately and joined them back — one more full pass over the
    # capped shingle relation plus a join exchange, for a value the
    # window partition already holds
    w_sz = Window.partitionBy("doc_id")
    prefix = (
        sh.join(dfreq, "s")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("n_sh", F.count("*").over(w_sz))
        .filter(
            F.col("pos")
            <= F.col("n_sh")
            - F.expr(f"(n_sh * {SETSIM_NUM} + {SETSIM_DEN} - 1) div {SETSIM_DEN}")
            + 1
        )
        .select("doc_id", "s", "pos", "n_sh")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    sa, sb = F.col("a.n_sh"), F.col("b.n_sh")
    candidates = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: den·min ≥ num·max
            & (F.least(sa, sb) * SETSIM_DEN >= F.greatest(sa, sb) * SETSIM_NUM)
            # positional filter: remaining-suffix overlap bound ≥ α
            # (α scaled by (num+den) to stay in exact integers:
            #  ub·(num+den) ≥ num·(sa+sb) ⟺ ub ≥ ⌈…⌉ for integer ub)
            & (
                (1 + F.least(sa - F.col("a.pos"), sb - F.col("b.pos")))
                * (SETSIM_NUM + SETSIM_DEN)
                >= SETSIM_NUM * (sa + sb)
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .transform(track_cache)  # feeds candidate-doc pruning and the final join
    )
    # candidate id-sets scale with collision count, not a constant —
    # no forced broadcast (size/AQE picks the strategy; locally Spark
    # still auto-broadcasts below threshold)
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    docs_c = load_table_parallel(spark, sf_dir, "documents", "doc_id").join(
        cand_docs, "doc_id", "left_semi"
    )
    # candidate shingles feed three consumers (both self-join sides
    # and the size aggregation) and are bounded by prefix-collision
    # count — cached, same rule as _minhash_pairs (round-14, §1.2)
    sh_c = track_cache(
        _shingles_of(docs_c).join(hot, "s", "left_anti")
    )
    ca = sh_c.alias("ca")
    cb = sh_c.alias("cb")
    # restrict the co-shingle pairs to CANDIDATE pairs before the
    # aggregation: candidate docs can co-pair far beyond the candidate
    # pairs themselves on dup-heavy corpora, so the semi-join keeps
    # verification work provably bounded by candidate count. A pure
    # restriction — inter ⊆ candidates afterwards, so no re-join with
    # candidates is needed.
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
    csizes = sh_c.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    jac = F.col("n_inter") / (F.col("sa") + F.col("sb") - F.col("n_inter"))
    return (
        inter.join(
            csizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sa")),
            "doc_a",
        )
        .join(
            csizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sb")),
            "doc_b",
        )
        .filter(_meets_threshold())
        .withColumn("jaccard", F.round(jac, 6))
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


# Universal-hash family over ONE md5 base hash: h_i = (a_i·h + b_i) mod p.
# One string hash per shingle instead of N_HASHES/4 md5 digests; the
# derivations are exact 64-bit integer ops, identical in any engine.
# p = 2^31 - 1 keeps a_i·h < 2^62 (no BIGINT overflow); a_i/b_i are
# fixed pseudo-random constants derived from the md5 family itself.
_MERSENNE_P = 2**31 - 1


def _uh_constants(i: int) -> tuple[int, int]:
    import hashlib

    a = int(hashlib.md5(f"uh-a:{i}".encode()).hexdigest()[:8], 16) % (_MERSENNE_P - 1) + 1
    b = int(hashlib.md5(f"uh-b:{i}".encode()).hexdigest()[:8], 16) % _MERSENNE_P
    return a, b


_UH = [_uh_constants(i) for i in range(N_HASHES)]


def _hash_family(col: F.Column) -> list[F.Column]:
    base = stable_hash32(col) % F.lit(_MERSENNE_P)
    return [
        (base * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE_P)
        for a, b in _UH
    ]


def _hash_family_sql(expr: str) -> list[str]:
    base = f"({stable_hash32_sql(expr)} % {_MERSENNE_P})"
    return [
        f"(({base} * {a} + {b}) % {_MERSENNE_P})"
        for a, b in _UH
    ]


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, s) distinct shingles → doc_id + minhash cols mh0..mh15
    in one aggregation pass."""
    hashes = _hash_family(F.col("s"))
    proj = sh.select(
        "doc_id", *[h.alias(f"h{i}") for i, h in enumerate(hashes)]
    )
    return proj.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"mh{i}") for i in range(N_HASHES)]
    )


def _band_signatures(sig: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_sig): md5 over the band's minhashes."""
    bands = []
    for b in range(N_BANDS):
        cols = [f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        bands.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws(",", *cols)).alias("band_sig"),
            )
        )
    return sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_sig")


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_pairs(spark, sf_dir, restrict_ids=None)


def _minhash_pairs(
    spark: SparkSession, sf_dir: str, restrict_ids: DataFrame | None
) -> DataFrame:
    """LSH candidates (band-bucket join) verified by exact Jaccard.

    The verification joins shingle sets of CANDIDATE docs only — the
    whole point of LSH at scale: exact similarity is computed on
    O(candidates), never on all pairs. Candidate shingles are
    RECOMPUTED from the candidate document subset (a broadcast
    semi-join on documents, then re-shingle) rather than read from a
    cached full-corpus shingle relation: at 100 TB the full (doc_id,
    shingle) relation is itself corpus-sized and cannot be cached,
    while the candidate subset is bounded by bucket collisions. Only
    collision-bounded relations persist: the hot-shingle (df-cap) set
    — which MUST be computed once and shared so signatures and
    verification agree on the capped universe — the candidate pairs,
    and the candidate-doc shingles (three consumers). Measured
    at sf0.1 this also beats the cached variant warm (4.7s vs 5.2s):
    cache materialization of 260k shingle rows costs more than one
    extra candidate-only shingle pass.

    ``restrict_ids`` (a doc_id relation) restricts PAIR ENDPOINTS
    before the verification stage. Per-pair verification commutes with
    endpoint restriction, so the result equals filtering the full pair
    output afterwards — but the exact-Jaccard work (candidate
    re-shingle + shingle self-join) runs only on the restricted
    candidates. corpus_clean passes its quality/exact-dedup survivors
    here, making the composite pipeline strictly cheaper than
    dedup_minhash_lsh alone at the same hash.
    """
    sh_full = _doc_shingles(spark, sf_dir)
    hot = (
        sh_full.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("s")
        .transform(track_cache)  # tiny heavy-hitter set; two consumers must agree
    )
    sh_capped = sh_full.join(hot, "s", "left_anti")
    bands = _band_signatures(minhash_signatures(sh_capped))
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    if restrict_ids is not None:
        candidates = candidates.join(
            restrict_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi"
        ).join(
            restrict_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi"
        )
    candidates = candidates.transform(
        track_cache  # feeds both the verification join and cand_docs pruning
    )
    # candidate id-sets scale with bucket-collision count — no forced
    # broadcast; size/AQE decides (auto-broadcast still fires locally)
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    docs_c = load_table_parallel(spark, sf_dir, "documents", "doc_id").join(
        cand_docs, "doc_id", "left_semi"
    )
    # candidate shingles feed THREE consumers (both self-join sides
    # and the size aggregation); unlike the corpus-sized full shingle
    # relation (docstring above), this subset is bounded by bucket
    # collisions, so caching it is scale-safe and saves two
    # re-shingling passes (round-14, guide §1.2)
    sh_c = track_cache(
        _shingles_of(docs_c).join(hot, "s", "left_anti")
    )
    ca = sh_c.alias("ca")
    cb = sh_c.alias("cb")
    # semi-join the co-shingle pair keys against candidates BEFORE the
    # aggregation: candidate docs co-pair quadratically on dup-heavy
    # corpora while candidate pairs stay collision-bounded, so the
    # restriction keeps verification work O(candidates) as the
    # docstring promises. Pure restriction — inter ⊆ candidates, no
    # re-join needed.
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
    return verified.select("doc_a", "doc_b", "jaccard").orderBy("doc_a", "doc_b")


def _minhash_cte() -> str:
    band_rows = []
    for i, h in enumerate(_hash_family_sql("s")):
        band_rows.append(f"min({h}) AS mh{i}")
    mh_cols = ",\n         ".join(band_rows)
    band_sigs = []
    for b in range(N_BANDS):
        cols = [f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        concat = " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_sigs.append(f"SELECT doc_id, {b} AS band_id, md5({concat}) AS band_sig FROM sig")
    bands_union = "\n  UNION ALL\n  ".join(band_sigs)
    return f"""
sig AS (
  SELECT doc_id,
         {mh_cols}
  FROM sh
  GROUP BY doc_id
),
bands AS (
  {bands_union}
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
   AND a.doc_id < b.doc_id
)
"""


DEDUP_MINHASH_SQL = f"""
WITH {_SHINGLES_CTE},
{_minhash_cte()},
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
SELECT c.doc_a, c.doc_b, e.jaccard
FROM candidates c JOIN exact e ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
ORDER BY c.doc_a, c.doc_b
"""


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 32


def _packed_bit_ones(tok, nbits: int, bit_expr):
    """SimHash bit-majority via PACKED counters (round 15, guide §1.2):
    the old shape aggregated one ±1 conditional sum PER BIT — nbits
    hash-agg buffers, each updating through a CASE WHEN on the map-side
    critical path. Two bit-counters now share one BIGINT lane (bit j in
    the low 32 bits, bit j+nbits/2 in the high), so the aggregate is
    nbits/2 branch-free sums plus one count(*): half the agg buffers,
    no branches, ~half the codegen.

    Equivalence is exact integer arithmetic: with ones_j = count of
    tokens whose bit j is set and n = token count, the old
    b_j = sum(±1) = 2*ones_j − n, so the majority test b_j > 0 is
    precisely 2*ones_j > n (ties → 0 bit, unchanged). Overflow-safe to
    n < 2^31 tokens per document: each 32-bit sublane holds ≤ n and the
    packed sum stays below 2^62.

    ``bit_expr(i)`` must return bit i of the token's hash as a LONG in
    {0, 1}. Returns ``(grouped_df, ones)`` where ``ones(i)`` unpacks
    the per-doc count of set bits at position i and the grouped frame
    carries ``n`` (token count)."""
    half = nbits // 2
    packed = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                bit_expr(j) + F.shiftleft(bit_expr(half + j), 32)
            ).alias(f"p{j}")
            for j in range(half)
        ],
    )

    def ones(i: int) -> "F.Column":
        if i < half:
            return F.col(f"p{i}").bitwiseAND((1 << 32) - 1)
        return F.shiftright(F.col(f"p{i - half}"), 32)

    return packed, ones


def _ones_sql(i: int, nbits: int) -> str:
    """SQL twin of _packed_bit_ones' unpack (for _recombine_sql)."""
    half = nbits // 2
    if i < half:
        return f"(p{i} & 4294967295)"
    return f"shiftright(p{i - half}, 32)"


def _balanced_sum_sql(terms: list[str]) -> str:
    """Pairwise-parenthesized sum — integer addition is associative so
    the value is identical to the left-deep chain, but the parsed tree
    is depth ceil(log2(n)) instead of n. Catalyst analysis and
    canonicalization walk (and re-walk, per consumer) the whole tree;
    at 128 terms the left-deep chain measurably dominates the entry's
    BUILD time (round-15 floor probe: simhash128_hamming_pairs spent
    3.6 s of a 5.4 s rep driver-side)."""
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})" if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _recombine_sql(bits: list[int], nbits: int) -> "F.Column":
    """Signature word from packed majority counters as ONE server-side
    parsed expression. The old shape chained F.when(...) per bit — one
    py4j round-trip per Column call (hundreds per signature) and a
    left-deep CaseWhen/Add tree whose analysis cost scaled with width
    (the round-14 'map-side CPU by width' claim was actually mostly
    DRIVER time, re-measured round 15). Semantics per bit are
    unchanged: majority ⟺ 2*ones > n, ties → 0, bit 63 of a word
    recombines as the BIGINT sign bit."""
    terms = []
    for k, j in enumerate(bits):
        mag = -(2**63) if k == 63 else 2**k
        terms.append(
            f"(CASE WHEN 2 * {_ones_sql(j, nbits)} > n "
            f"THEN CAST({mag} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    return F.expr(_balanced_sum_sql(terms))


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit simhash per document (token-frequency weighted).

    Bit majorities are aggregated as packed lane counters — see
    _packed_bit_ones for the arithmetic-equivalence argument; the
    recombined signature is bit-identical to the per-bit ±1 shape the
    oracle SQL still uses."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("t")
    ).withColumn("h", stable_hash32(F.col("t")))

    def bit(j: int) -> "F.Column":
        return F.shiftright(F.col("h"), j).bitwiseAND(1)

    bit_sums, _ones = _packed_bit_ones(tok, SIMHASH_BITS, bit)
    sim = _recombine_sql(list(range(SIMHASH_BITS)), SIMHASH_BITS)
    return bit_sums.select(
        "doc_id", sim.alias("simhash")
    ).orderBy("doc_id")


def _simhash_sql() -> str:
    bit_aggs = ",\n         ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    recombine = " + ".join(
        f"CASE WHEN b{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, {stable_hash32_sql('t')} AS h
  FROM (SELECT doc_id, unnest({tokens_sql('text')}) AS t FROM documents)
),
bits AS (
  SELECT doc_id,
         {bit_aggs}
  FROM tok GROUP BY doc_id
)
SELECT doc_id, {recombine} AS simhash
FROM bits
ORDER BY doc_id
"""


SIMHASH_SQL = _simhash_sql()


# --------------------------------------------------------------------------
# exact substring-span dedup (the ExactSubstr shape)
# --------------------------------------------------------------------------

SPAN_K = 5  # minimum duplicated run, in tokens


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-LEVEL exact duplication: the maximal token runs (>= SPAN_K
    tokens) that occur more than once in the corpus — the
    suffix-array-style "remove the duplicated substring, keep the
    document" dedup family, complementing the doc-level pair variants
    above. Published shape: Lee et al., "Deduplicating Training Data
    Makes Language Models Better" (ExactSubstr).

    Spark-first derivation, no suffix array and no pairing anywhere
    (hence no quadratic risk — this runs where even LSH is overkill):

    1. every K-token window per document, by position, built from the
       token ARRAY with transform+slice (one projection — the text is
       tokenized once, never re-split per window);
    2. a window duplicated anywhere in the corpus (occurrence count
       >= 2, same doc or not — self-repetition is duplication too) is
       one global aggregation on the gram;
    3. each document's flagged positions collapse into maximal spans
       via gaps-and-islands (pos − row_number() per doc), so
       overlapping windows merge: [start, start+K), [start+1, ...)
       become ONE span [min, max+K).

    Scale: one shuffle on the gram (count), one on doc_id (islands
    window); the gram relation is token-linear in corpus size. Output:
    (doc_id, span_start, span_end, span_tokens) in token indices,
    end-exclusive, 0-based."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    toked = docs.select("doc_id", tokens("text").alias("tt")).filter(
        F.size("tt") >= SPAN_K
    )
    grams = toked.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(tt) - {SPAN_K}),"
                f" i -> concat_ws(' ', slice(tt, i + 1, {SPAN_K})))"
            )
        ).alias("pos", "g"),
    )
    dup = grams.groupBy("g").agg(F.count("*").alias("cnt")).filter(
        F.col("cnt") >= 2
    )
    # the duplicated-gram set scales with corpus redundancy — no
    # forced broadcast, size/AQE decides
    marked = grams.join(dup.select("g"), "g", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = marked.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + SPAN_K).cast("long").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
        .orderBy("doc_id", "span_start")
    )


SUBSTRING_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql('text')} AS tt FROM documents
), grams AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(tt, i, i + {SPAN_K} - 1), ' ') AS g
  FROM toks, unnest(generate_series(1, len(tt) - {SPAN_K} + 1)) AS u(i)
  WHERE len(tt) >= {SPAN_K}
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM grams WHERE g IN (SELECT g FROM dup)
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT)            AS span_start,
       CAST(max(pos) + {SPAN_K} AS BIGINT) AS span_end,
       CAST(max(pos) + {SPAN_K} - min(pos) AS BIGINT) AS span_tokens
FROM isl
GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""


def substring_dup_rate_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus-level readout of the span dedup: per source, what
    fraction of token mass sits inside duplicated spans — the number
    that decides whether remove-the-substring dedup is worth a pass
    over that source. Exact integer micro-ratio (span tokens · 1e6 div
    total tokens); spans are disjoint per doc by construction, so the
    sum never double-counts."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    tok_counts = docs.select(
        "doc_id", "source", F.size(tokens("text")).cast("long").alias("n_tok")
    )
    span_tok = (
        dedup_substring_spans(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.sum("span_tokens").alias("dup_tok"))
    )
    return (
        tok_counts.join(span_tok, "doc_id", "left")
        .fillna(0, ["dup_tok"])
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum("dup_tok").cast("long").alias("dup_tokens"),
            F.expr("CAST(sum(dup_tok) * 1000000 div sum(n_tok) AS LONG)").alias(
                "dup_rate_micro"
            ),
        )
        .orderBy("source")
    )


SUBSTRING_RATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, {tokens_sql('text')} AS tt FROM documents
), grams AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(tt, i, i + {SPAN_K} - 1), ' ') AS g
  FROM toks, unnest(generate_series(1, len(tt) - {SPAN_K} + 1)) AS u(i)
  WHERE len(tt) >= {SPAN_K}
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM grams WHERE g IN (SELECT g FROM dup)
), spans AS (
  SELECT doc_id, max(pos) + {SPAN_K} - min(pos) AS span_tokens
  FROM isl GROUP BY doc_id, grp
), per_doc AS (
  SELECT t.doc_id, t.source, len(t.tt) AS n_tok,
         coalesce(s.dup_tok, 0) AS dup_tok
  FROM toks t
  LEFT JOIN (SELECT doc_id, sum(span_tokens) AS dup_tok
             FROM spans GROUP BY doc_id) s USING (doc_id)
)
SELECT source,
       count(*)                 AS n_docs,
       CAST(sum(n_tok) AS BIGINT)   AS total_tokens,
       CAST(sum(dup_tok) AS BIGINT) AS dup_tokens,
       CAST(sum(dup_tok) * 1000000 // sum(n_tok) AS BIGINT) AS dup_rate_micro
FROM per_doc
GROUP BY source
ORDER BY source
"""


def scrub_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step completing the ExactSubstr story (Lee et al.):
    dedup_substring_spans DETECTS maximal duplicated token runs; this
    transform REMOVES every token inside one and certifies the cleaned
    text byte-exactly — ``cleaned_md5`` is the md5 of the kept tokens
    re-joined in order, which the DuckDB oracle re-derives from its own
    full replay of the span pipeline plus the removal. (Aggressive
    variant: every occurrence of a duplicated run is scrubbed; the
    keep-one-copy policy is the doc-level dedup family's job.)

    Scale shape: the span relation joins back on doc_id (one shuffle);
    the removal is a per-token JVM filter whose inner exists() runs
    over that document's OWN spans (few by construction — maximal and
    disjoint), so the per-row path stays whole-stage-codegen with no
    Python and no pairing anywhere."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    toked = docs.select("doc_id", tokens("text").alias("tt"))
    spans = dedup_substring_spans(spark, sf_dir).groupBy("doc_id").agg(
        F.collect_list(
            F.struct("span_start", "span_end")
        ).alias("sp")
    )
    joined = toked.join(spans, "doc_id", "left")
    kept = F.expr(
        "filter(transform(tt, (t, i) -> struct(t AS t, i AS i)),"
        " x -> sp IS NULL OR NOT exists(sp,"
        " s -> x.i >= s.span_start AND x.i < s.span_end))"
    )
    return (
        joined.select("doc_id", F.size("tt").cast("long").alias("n_tok"), kept.alias("k"))
        .select(
            "doc_id",
            "n_tok",
            F.size("k").cast("long").alias("kept_tok"),
            (F.col("n_tok") - F.size("k")).cast("long").alias("removed_tok"),
            F.md5(F.concat_ws(" ", F.expr("transform(k, x -> x.t)"))).alias(
                "cleaned_md5"
            ),
        )
        .orderBy("doc_id")
    )


SCRUB_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql('text')} AS tt FROM documents
), grams AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(tt, i, i + {SPAN_K} - 1), ' ') AS g
  FROM toks, unnest(generate_series(1, len(tt) - {SPAN_K} + 1)) AS u(i)
  WHERE len(tt) >= {SPAN_K}
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM grams WHERE g IN (SELECT g FROM dup)
), spans AS (
  SELECT doc_id, min(pos) AS span_start, max(pos) + {SPAN_K} AS span_end
  FROM isl GROUP BY doc_id, grp
), pos_tokens AS (
  SELECT doc_id, tt[i] AS t, i - 1 AS pos
  FROM toks, unnest(generate_series(1, len(tt))) AS u(i)
), kept AS (
  SELECT p.doc_id,
         count(*) AS kept_tok,
         md5(string_agg(p.t, ' ' ORDER BY p.pos)) AS cleaned_md5
  FROM pos_tokens p
  WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = p.doc_id
      AND p.pos >= s.span_start AND p.pos < s.span_end
  )
  GROUP BY p.doc_id
)
SELECT t.doc_id,
       CAST(len(t.tt) AS BIGINT) AS n_tok,
       CAST(coalesce(k.kept_tok, 0) AS BIGINT) AS kept_tok,
       CAST(len(t.tt) - coalesce(k.kept_tok, 0) AS BIGINT) AS removed_tok,
       coalesce(k.cleaned_md5, md5('')) AS cleaned_md5
FROM toks t LEFT JOIN kept k USING (doc_id)
ORDER BY t.doc_id
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_pairs": dedup_ngram_pairs,
    "dedup_setsim_prefix": dedup_setsim_prefix,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "simhash_docs": simhash_docs,
    "dedup_substring_spans": dedup_substring_spans,
    "substring_dup_rate_by_source": substring_dup_rate_by_source,
    "scrub_duplicated_spans": scrub_duplicated_spans,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_pairs": DEDUP_NGRAM_SQL,
    # exact algorithm -> the plain all-pairs SQL IS its oracle: an
    # independent derivation that must hash-match the prefix-filter plan
    "dedup_setsim_prefix": DEDUP_NGRAM_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_SQL,
    "simhash_docs": SIMHASH_SQL,
    "dedup_substring_spans": SUBSTRING_SPANS_SQL,
    "substring_dup_rate_by_source": SUBSTRING_RATE_SQL,
    "scrub_duplicated_spans": SCRUB_SPANS_SQL,
}


# --------------------------------------------------------------------------
# exact asymmetric containment join
# --------------------------------------------------------------------------

# containment threshold 0.8 as an exact fraction (same
# integer-comparison discipline as SETSIM_NUM/DEN)
CONTAIN_NUM, CONTAIN_DEN = 4, 5
# tiny shingle sets make containment trivially noisy (any 2 shared
# shingles of a 2-shingle doc = full containment) — require substance
CONTAIN_MIN_SH = 8


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: pairs where one document's
    shingle set is ≥ 80% contained in another's —
    C(A→B) = |A∩B| / |A| ≥ 4/5. Jaccard misses these (a paragraph
    quoted inside a 10× larger page has high containment but low
    Jaccard), yet they are exactly the quote/boilerplate/subset dups a
    crawl cleanup must catch; both directions are tested and emitted
    separately because containment is not symmetric.

    Intersections are counted ONCE per unordered pair (doc_a < doc_b
    co-shingle join over the df-capped universe — the same
    stopword-shingle guard as every dedup flavor), then each direction
    applies its own integer threshold test
    n_inter · DEN ≥ NUM · |side| (never a rounded-float comparison;
    the float is display-only). Docs under CONTAIN_MIN_SH shingles are
    excluded from the contained side — a 2-shingle fragment would be
    "contained" everywhere.

    Scale: identical join geometry to dedup_ngram_pairs — per-shingle
    fan-out is df², bounded by the df-cap. The round-11 10× soak
    (PERF.md, BENCH_sf1_r11) measured this superlinear (21.9×) on the
    synthetic tables: their uniform 31-word vocabulary keeps every
    shingle BELOW the cap while df grows linearly with corpus size,
    so Σ df² grows quadratically — a property of that corpus, not of
    the plan; on Zipf-distributed real crawls the cap truncates the
    head and sub-cap df is corpus-size-independent. The asymmetric
    PREFIX-filter refinement (contained-side prefix of the
    |A| − ⌈t·|A|⌉ + 1 df-rarest shingles joined against the
    container-side full index, PPJoin-style) was implemented and
    measured in round 11 and REJECTED on data: on the uniform-df
    corpus nearly every doc becomes a candidate doc, so the
    candidate-bounded verification re-pays the full co-shingle join
    on top of the prefix join — 2.4→7.6 s at sf0.1 and 53→71 s at
    sf1, slower at BOTH scale factors. dedup_setsim_prefix remains
    the proven exact prefix path where its symmetric prunes apply."""
    # the capped relation feeds both join sides AND the size agg —
    # cache it once (track_cache releases it when the next query
    # builds) instead of re-deriving shingles + hot-set three times
    sh = track_cache(_doc_shingles_capped(spark, sf_dir))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
        .join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sa")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sb")),
            "doc_b",
        )
    )
    d1 = pairs.filter(
        (F.col("sa") >= CONTAIN_MIN_SH)
        & (F.col("n_inter") * CONTAIN_DEN >= CONTAIN_NUM * F.col("sa"))
    ).select(
        F.col("doc_a").alias("contained_doc"),
        F.col("doc_b").alias("container_doc"),
        F.round(F.col("n_inter") / F.col("sa"), 6).alias("containment"),
    )
    d2 = pairs.filter(
        (F.col("sb") >= CONTAIN_MIN_SH)
        & (F.col("n_inter") * CONTAIN_DEN >= CONTAIN_NUM * F.col("sb"))
    ).select(
        F.col("doc_b").alias("contained_doc"),
        F.col("doc_a").alias("container_doc"),
        F.round(F.col("n_inter") / F.col("sb"), 6).alias("containment"),
    )
    return d1.unionByName(d2).orderBy("contained_doc", "container_doc")


DEDUP_CONTAIN_SQL = f"""
WITH {_SHINGLES_CTE},
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sized AS (
  SELECT doc_a, doc_b, n_inter, x.n_sh AS sa, y.n_sh AS sb
  FROM pairs JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
)
SELECT contained_doc, container_doc, containment FROM (
  SELECT doc_a AS contained_doc, doc_b AS container_doc,
         round(n_inter * 1.0 / sa, 6) AS containment
  FROM sized
  WHERE sa >= {CONTAIN_MIN_SH}
    AND n_inter * {CONTAIN_DEN} >= {CONTAIN_NUM} * sa
  UNION ALL
  SELECT doc_b, doc_a, round(n_inter * 1.0 / sb, 6)
  FROM sized
  WHERE sb >= {CONTAIN_MIN_SH}
    AND n_inter * {CONTAIN_DEN} >= {CONTAIN_NUM} * sb
)
ORDER BY contained_doc, container_doc
"""

QUERIES["dedup_containment_pairs"] = dedup_containment_pairs
ORACLES["dedup_containment_pairs"] = DEDUP_CONTAIN_SQL


# --------------------------------------------------------------------------
# novelty scoring (diversity-aware selection signal)
# --------------------------------------------------------------------------


def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct shingles
    that appear NOWHERE else in the corpus (df = 1) — the
    diversity-selection signal dual to dedup: dedup drops what repeats,
    novelty ranks what doesn't. Selection pipelines mix this with
    quality scores to avoid over-sampling templated content that
    survives near-dup removal.

    One shuffle to shingle df, one join back, one doc-grain agg;
    novelty on the integer ppm grid. Uses the UNCAPPED shingle
    universe — the df-cap guards pairing fan-out, which this
    aggregation doesn't have (per-shingle work is O(df) rows, already
    linear)."""
    sh = _doc_shingles(spark, sf_dir)
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))
    return (
        sh.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long"))
            .cast("long")
            .alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique",
            F.expr("CAST(n_unique * 1000000 DIV n_shingles AS BIGINT)").alias(
                "novelty_ppm"
            ),
        )
        .orderBy("doc_id")
    )


DOC_NOVELTY_SQL = f"""
WITH sh_all AS (
  SELECT DISTINCT doc_id,
         unnest({shingles_sql("text", SHINGLE_N)}) AS s
  FROM documents
), dfreq AS (
  SELECT s, count(*) AS df FROM sh_all GROUP BY 1
)
SELECT a.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS novelty_ppm
FROM sh_all a JOIN dfreq d ON a.s = d.s
GROUP BY a.doc_id
ORDER BY a.doc_id
"""

QUERIES["doc_novelty_scores"] = doc_novelty_scores
ORACLES["doc_novelty_scores"] = DOC_NOVELTY_SQL


# --------------------------------------------------------------------------
# MinHash estimator calibration
# --------------------------------------------------------------------------


def minhash_estimate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality evidence for the MinHash family: for every
    LSH candidate pair, the signature-agreement Jaccard ESTIMATE
    (matching minhashes / 16) side-by-side with the exact Jaccard and
    the absolute error — the calibration table that justifies trusting
    banded LSH at a scale where exact verification is rationed. All
    ppm-grid integers; the oracle re-derives signatures AND exact
    overlaps independently, so the hash match certifies the estimator
    itself, not just the plumbing.

    Scale: signatures are doc-grain (cached, 17 columns); estimate
    cost is candidates × 16 integer equality tests; the exact side is
    the candidate-restricted re-shingle join every LSH verify uses."""
    sh_full = _doc_shingles(spark, sf_dir)
    hot = track_cache(
        sh_full.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("s")
    )
    sh_capped = sh_full.join(hot, "s", "left_anti")
    sig = track_cache(minhash_signatures(sh_capped))
    bands = _band_signatures(sig)
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = track_cache(
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    docs_c = load_table_parallel(spark, sf_dir, "documents", "doc_id").join(
        cand_docs, "doc_id", "left_semi"
    )
    sh_c = _shingles_of(docs_c).join(hot, "s", "left_anti")
    ca = sh_c.alias("ca")
    cb = sh_c.alias("cb")
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
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"xa{i}") for i in range(N_HASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"xb{i}") for i in range(N_HASHES)],
    )
    matches = sum(
        (F.col(f"xa{i}") == F.col(f"xb{i}")).cast("long")
        for i in range(N_HASHES)
    )
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("za")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("zb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            matches.alias("est_matches"),
            F.coalesce(F.col("n_inter"), F.lit(0)).alias("ni"),
            "za",
            "zb",
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("est_matches").cast("long").alias("est_matches"),
            F.expr(f"CAST(est_matches * 1000000 DIV {N_HASHES} AS BIGINT)").alias(
                "est_ppm"
            ),
            F.expr(
                "CAST(ni * 1000000 DIV (za + zb - ni) AS BIGINT)"
            ).alias("true_ppm"),
            F.expr(
                f"CAST(abs(est_matches * 1000000 DIV {N_HASHES}"
                " - ni * 1000000 DIV (za + zb - ni)) AS BIGINT)"
            ).alias("err_ppm"),
        )
        .orderBy("doc_a", "doc_b")
    )


_MH_EQ = " + ".join(
    f"CASE WHEN x.mh{i} = y.mh{i} THEN 1 ELSE 0 END" for i in range(N_HASHES)
)

MINHASH_CALIBRATION_SQL = f"""
WITH {_SHINGLES_CTE},
{_minhash_cte()},
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       CAST({_MH_EQ} AS BIGINT) AS est_matches,
       CAST(({_MH_EQ}) * 1000000 // {N_HASHES} AS BIGINT) AS est_ppm,
       CAST(coalesce(i.n_inter, 0) * 1000000
            // (za.n_sh + zb.n_sh - coalesce(i.n_inter, 0)) AS BIGINT)
         AS true_ppm,
       CAST(abs(({_MH_EQ}) * 1000000 // {N_HASHES}
                - coalesce(i.n_inter, 0) * 1000000
                  // (za.n_sh + zb.n_sh - coalesce(i.n_inter, 0)))
            AS BIGINT) AS err_ppm
FROM candidates c
JOIN sig x ON c.doc_a = x.doc_id
JOIN sig y ON c.doc_b = y.doc_id
LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
JOIN sz za ON c.doc_a = za.doc_id
JOIN sz zb ON c.doc_b = zb.doc_id
ORDER BY c.doc_a, c.doc_b
"""

QUERIES["minhash_estimate_calibration"] = minhash_estimate_calibration
ORACLES["minhash_estimate_calibration"] = MINHASH_CALIBRATION_SQL


# --------------------------------------------------------------------------
# SimHash Hamming-distance near-dup join (pigeonhole chunk blocking)
# --------------------------------------------------------------------------

HAM_MAX = 3       # near-dup iff hamming(simhash_a, simhash_b) <= 3
HAM_CHUNKS = 4    # 32 bits -> 4 x 8-bit chunks; 3 flips miss <= 3 chunks


def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance — the Manku-
    Jain-Sarma 2007 web-scale design completing this module's simhash
    story (simhash_docs computes signatures; this finds the pairs).
    Candidate generation is EXACT by pigeonhole: split the 32-bit
    signature into HAM_CHUNKS 8-bit chunks; ≤ HAM_MAX (= CHUNKS − 1)
    differing bits can touch at most HAM_MAX chunks, so every true
    pair shares at least one chunk value — the (chunk_idx, chunk_val)
    equi-join finds ALL of them (100% recall, no verification-miss
    caveat), and popcount(xor) verifies candidates exactly.

    Scale: the blocking join shuffles only (chunk, value) membership
    rows — 4 per doc; fan-out concentrates on hot chunk values the
    same way LSH bands do (and the same df-cap treatment applies if a
    degenerate corpus makes one chunk value hot). Never all-pairs —
    but candidate COUNT grows as d²/256 once doc count passes the
    8-bit chunk space (measured: the round-11 30× probe, PERF.md).
    That is inherent to 32-bit SimHash: Manku-Jain-Sarma run 64-bit
    fingerprints with wider chunk spaces so buckets outnumber
    documents. SIMHASH_BITS is registry-pinned semantics here; the
    registered scale twin is simhash64_hamming_pairs below (4×16-bit
    chunks, 65,536 bucket values) — a ChunkSpaceHint fires when the
    corpus outgrows this entry's 256-value chunk space."""
    from .scale_hints import warn_if_chunk_space_saturated

    warn_if_chunk_space_saturated(
        "simhash_hamming_pairs",
        "simhash64_hamming_pairs",
        chunk_space=2**8,
        table_path=f"{sf_dir}/documents.parquet",
    )
    sims = simhash_docs(spark, sf_dir).transform(track_cache)
    chunks = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright(F.col("simhash"), 8 * i)
                        .bitwiseAND(255)
                        .alias("cv"),
                    )
                    for i in range(HAM_CHUNKS)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.ci", "c.cv")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(
                F.col("sa").bitwiseXOR(F.col("sb"))
            ).cast("long"),
        )
        .filter(F.col("hamming") <= HAM_MAX)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


SIMHASH_HAMMING_SQL = f"""
WITH sims AS MATERIALIZED (
{SIMHASH_SQL.replace("ORDER BY doc_id", "")}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAM_MAX}
ORDER BY doc_a, doc_b
"""

QUERIES["simhash_hamming_pairs"] = simhash_hamming_pairs
# oracle = the INDEPENDENT all-pairs derivation: hash-matching it
# proves the pigeonhole blocking lost nothing
ORACLES["simhash_hamming_pairs"] = SIMHASH_HAMMING_SQL


# --------------------------------------------------------------------------
# 64-bit SimHash — the chunk-space scale twin (Manku-Jain-Sarma 2007)
# --------------------------------------------------------------------------
#
# The round-11 30× probe measured simhash_hamming_pairs going 9.6×
# superlinear: 4×8-bit chunks give only 256 bucket values per chunk,
# so pigeonhole candidates grow as d²/256 once doc count passes the
# bucket count. Manku-Jain-Sarma run 64-bit fingerprints for exactly
# this reason. This twin is the scale path: 64-bit signatures split
# into 4×16-bit chunks — 65,536 bucket values per chunk, so buckets
# outnumber documents until ~2M docs per partition-domain and the
# same ≤3-bit Hamming radius keeps 100% pigeonhole recall (3 flips
# touch ≤ 3 of 4 chunks; one chunk always matches exactly).
#
# (Reference scope: the reference exports rows only,
# repository/ParameterDataRepository.java:53-78 — the dedup family is
# north-star surface, SURVEY §2 LLM-pipeline rows.)

SIMHASH64_BITS = 64
HAM64_MAX = 3      # same near-dup radius as the 32-bit anchor
HAM64_CHUNKS = 4   # 64 bits -> 4 x 16-bit chunks, 65,536 values each
_SIMHASH64_SEED = 64  # decorrelates the 64-bit family from the plain-md5 32-bit one


def simhash64_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit simhash per document (token-frequency weighted).

    Bits 0-31 come from the first 32-bit word of md5('64:'||token),
    bits 32-63 from the second — ONE digest evaluation per token
    (stable_hash32_x4), both engines bit-identical. Bit 63 recombines
    as the BIGINT sign bit (-2^63), so the signature is a single
    signed 64-bit column on which xor/bit_count operate exactly.

    Scale: same shape as simhash_docs — explode to token grain
    (hash-repartitioned on doc_id), 32 packed branch-free bit-counter
    sums (see _packed_bit_ones) with map-side partial aggregation, no
    shuffle beyond the doc_id groupBy."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    hs = stable_hash32_x4(F.col("t"), _SIMHASH64_SEED)
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("t")
    ).select("doc_id", hs[0].alias("h0"), hs[1].alias("h1"))

    def bit(j: int) -> "F.Column":
        return F.shiftright(
            F.col("h0" if j < 32 else "h1"), j % 32
        ).bitwiseAND(1)

    # packed lane counters (see _packed_bit_ones): 32 branch-free sums
    # instead of 64 conditional ones; recombination is bit-identical
    bit_sums, _ones = _packed_bit_ones(tok, SIMHASH64_BITS, bit)
    sim = _recombine_sql(list(range(SIMHASH64_BITS)), SIMHASH64_BITS)
    return bit_sums.select(
        "doc_id", sim.alias("simhash64")
    ).orderBy("doc_id")


def _simhash64_sql() -> str:
    h0, h1 = stable_hash32_x4_sql("t", _SIMHASH64_SEED)[:2]
    bit_aggs = ",\n         ".join(
        f"sum(CASE WHEN (h{0 if j < 32 else 1} >> {j % 32}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH64_BITS)
    )
    terms = []
    for j in range(SIMHASH64_BITS):
        mag = -(2**63) if j == 63 else 2**j
        terms.append(
            f"CASE WHEN b{j} > 0 THEN CAST({mag} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END"
        )
    recombine = " + ".join(terms)
    return f"""
WITH tok AS (
  SELECT doc_id, {h0} AS h0, {h1} AS h1
  FROM (SELECT doc_id, unnest({tokens_sql('text')}) AS t FROM documents)
),
bits AS (
  SELECT doc_id,
         {bit_aggs}
  FROM tok GROUP BY doc_id
)
SELECT doc_id, {recombine} AS simhash64
FROM bits
ORDER BY doc_id
"""


SIMHASH64_SQL = _simhash64_sql()


def simhash64_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash Hamming distance — the scale
    twin closing the round-11 finding on simhash_hamming_pairs.
    Identical join shape (pigeonhole chunk blocking, popcount-xor
    verify, 100% recall at radius HAM64_MAX = CHUNKS − 1) but with
    16-bit chunks: candidate fan-out per chunk is d²/65,536 instead
    of d²/256, so the blocking stays linear-with-margin until the
    corpus passes ~2M docs. The next rung is now IMPLEMENTED (round-13,
    closing r12 residual #4): simhash128_hamming_pairs below widens to
    a 128-bit fingerprint with Manku-Jain-Sarma combined-block keys
    (chunk PAIRS, 2³² bucket values) — a ChunkSpaceHint fires when the
    corpus outgrows this entry's 65,536-value chunk space.

    Chunk extraction masks after the arithmetic shift
    ((sig >> 16i) & 0xFFFF), so the sign bit of the BIGINT-carried
    signature never leaks into bucket values."""
    from .scale_hints import warn_if_chunk_space_saturated

    warn_if_chunk_space_saturated(
        "simhash64_hamming_pairs",
        "simhash128_hamming_pairs",
        chunk_space=2**16,
        table_path=f"{sf_dir}/documents.parquet",
    )
    sims = simhash64_docs(spark, sf_dir).transform(track_cache)
    chunks = sims.select(
        "doc_id",
        "simhash64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright(F.col("simhash64"), 16 * i)
                        .bitwiseAND(65535)
                        .alias("cv"),
                    )
                    for i in range(HAM64_CHUNKS)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash64", "c.ci", "c.cv")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash64").alias("sa"),
            F.col("b.simhash64").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(
                F.col("sa").bitwiseXOR(F.col("sb"))
            ).cast("long"),
        )
        .filter(F.col("hamming") <= HAM64_MAX)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


SIMHASH64_HAMMING_SQL = f"""
WITH sims AS MATERIALIZED (
{SIMHASH64_SQL.replace("ORDER BY doc_id", "")}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash64, b.simhash64)) AS BIGINT) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash64, b.simhash64)) <= {HAM64_MAX}
ORDER BY doc_a, doc_b
"""

QUERIES["simhash64_docs"] = simhash64_docs
ORACLES["simhash64_docs"] = SIMHASH64_SQL
QUERIES["simhash64_hamming_pairs"] = simhash64_hamming_pairs
# oracle = the INDEPENDENT all-pairs derivation over the 64-bit
# signatures: hash-matching proves the 16-bit pigeonhole lost nothing
ORACLES["simhash64_hamming_pairs"] = SIMHASH64_HAMMING_SQL


# --------------------------------------------------------------------------
# 128-bit SimHash with combined-block keys — the rung past simhash64
# (round 13, closing round-12 residual #4 / VERDICT task 6)
# --------------------------------------------------------------------------
#
# simhash64's single-chunk pigeonhole keys saturate once documents
# outnumber the 65,536-value chunk space (~2M docs per partition
# domain at the hinted 32× factor). Manku-Jain-Sarma 2007 §3 names
# the fix: probe on COMBINATIONS of blocks. With 8×16-bit chunks over
# a 128-bit fingerprint and radius 3, at most 3 chunks differ, so at
# least 5 of 8 chunks match exactly — hence at least C(5,2)=10 of the
# C(8,2)=28 chunk PAIRS match. Keying candidates on (pair_id,
# chunk_i·2¹⁶ + chunk_j) gives 32-bit bucket values: buckets
# outnumber documents until ~4B docs per partition domain, a ~65,000×
# ceiling raise over simhash64 for a 7× key fan-out (28 vs 4 rows per
# doc). The rung after THIS one is chunk TRIPLES (C(8,3)=56 48-bit
# keys, radius ≤ 4 with 8 chunks would break recall — triples hold
# radius 3 since 5 untouched chunks still give C(5,3)=10 matching
# triples) or sharding the key join by a corpus partition key.
#
# (Reference scope: the reference exports rows only,
# repository/ParameterDataRepository.java:53-78 — the dedup family is
# north-star surface, SURVEY §2 LLM-pipeline rows.)

SIMHASH128_BITS = 128
HAM128_MAX = 3      # same near-dup radius as the 32/64-bit rungs
HAM128_CHUNKS = 8   # 128 bits -> 8 x 16-bit chunks
_SIMHASH128_SEED = 128  # decorrelates from the 32-bit (plain) and 64-bit (seed 64) families
_PAIRS128 = [
    (i, j)
    for i in range(HAM128_CHUNKS)
    for j in range(HAM128_CHUNKS)
    if i < j
]  # 28 combined-block keys


def simhash128_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-bit simhash per document, carried as two signed BIGINTs
    (sim_hi = bits 64..127, sim_lo = bits 0..63; bit 63 of each word
    recombines as the sign bit, so xor/bit_count stay exact).

    All 128 bit-hashes come from ONE md5 digest per token
    (stable_hash32_x4: the full 128-bit digest split into four 32-bit
    words), both engines bit-identical. Same plan shape as
    simhash_docs/simhash64_docs: explode to token grain
    (hash-repartitioned on doc_id), 64 packed branch-free bit-counter
    sums (see _packed_bit_ones) with map-side partial aggregation, no
    shuffle beyond the doc_id groupBy — the extra width is pure
    map-side CPU, not shuffle."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    hs = stable_hash32_x4(F.col("t"), _SIMHASH128_SEED)
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("t")
    ).select(
        "doc_id", *[hs[w].alias(f"h{w}") for w in range(4)]
    )

    def bit(j: int) -> "F.Column":
        return F.shiftright(F.col(f"h{j // 32}"), j % 32).bitwiseAND(1)

    # packed lane counters (see _packed_bit_ones): 64 branch-free sums
    # instead of 128 conditional ones; recombination is bit-identical
    bit_sums, _ones = _packed_bit_ones(tok, SIMHASH128_BITS, bit)

    def word(base: int) -> "F.Column":
        return _recombine_sql(
            [base + k for k in range(64)], SIMHASH128_BITS
        )

    return bit_sums.select(
        "doc_id", word(64).alias("sim_hi"), word(0).alias("sim_lo")
    ).orderBy("doc_id")


def _simhash128_sql() -> str:
    hws = stable_hash32_x4_sql("t", _SIMHASH128_SEED)
    bit_aggs = ",\n         ".join(
        f"sum(CASE WHEN (h{j // 32} >> {j % 32}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH128_BITS)
    )

    def word(base: int) -> str:
        terms = []
        for k in range(64):
            mag = -(2**63) if k == 63 else 2**k
            terms.append(
                f"CASE WHEN b{base + k} > 0 THEN CAST({mag} AS BIGINT) "
                "ELSE CAST(0 AS BIGINT) END"
            )
        return " + ".join(terms)

    h_sel = ", ".join(f"{hws[w]} AS h{w}" for w in range(4))
    return f"""
WITH tok AS (
  SELECT doc_id, {h_sel}
  FROM (SELECT doc_id, unnest({tokens_sql('text')}) AS t FROM documents)
),
bits AS (
  SELECT doc_id,
         {bit_aggs}
  FROM tok GROUP BY doc_id
)
SELECT doc_id, {word(64)} AS sim_hi, {word(0)} AS sim_lo
FROM bits
ORDER BY doc_id
"""


SIMHASH128_SQL = _simhash128_sql()


def _chunk128(hi: "F.Column", lo: "F.Column", i: int) -> "F.Column":
    """16-bit chunk i (0..7) of the (hi, lo) signature, masked after
    the arithmetic shift so sign bits never leak into bucket values."""
    src = lo if i < 4 else hi
    return F.shiftright(src, 16 * (i % 4)).bitwiseAND(65535)


def simhash128_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 128-bit SimHash Hamming distance — the
    combined-block rung past simhash64_hamming_pairs (see section
    comment for the recall proof and the ceiling arithmetic).

    Join shape is identical to the narrower rungs — explode to key
    grain, equi-join on (key_id, key_value), popcount-xor verify on
    candidates only — but the key value is a chunk PAIR
    (cv_i·65536 + cv_j): 2³² bucket values, so candidate fan-out per
    key is d²/2³². Fan-out is 28 rows/doc (vs 4); at 100 TB that is a
    constant-factor shuffle-width increase for a quadratic candidate
    reduction. distinct() before the verify dedups the ≥10 key
    collisions every true pair produces."""
    sims = simhash128_docs(spark, sf_dir).transform(track_cache)
    hi, lo = F.col("sim_hi"), F.col("sim_lo")
    keys = sims.select(
        "doc_id",
        "sim_hi",
        "sim_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("ci"),
                        (
                            _chunk128(hi, lo, i) * 65536
                            + _chunk128(hi, lo, j)
                        ).alias("cv"),
                    )
                    for k, (i, j) in enumerate(_PAIRS128)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "sim_hi", "sim_lo", "c.ci", "c.cv")
    a = keys.alias("a")
    b = keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sim_hi").alias("ha"),
            F.col("a.sim_lo").alias("la"),
            F.col("b.sim_hi").alias("hb"),
            F.col("b.sim_lo").alias("lb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            (
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
            ).cast("long"),
        )
        .filter(F.col("hamming") <= HAM128_MAX)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


SIMHASH128_HAMMING_SQL = f"""
WITH sims AS MATERIALIZED (
{SIMHASH128_SQL.replace("ORDER BY doc_id", "")}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sim_hi, b.sim_hi))
            + bit_count(xor(a.sim_lo, b.sim_lo)) AS BIGINT) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim_hi, b.sim_hi))
      + bit_count(xor(a.sim_lo, b.sim_lo)) <= {HAM128_MAX}
ORDER BY doc_a, doc_b
"""

QUERIES["simhash128_docs"] = simhash128_docs
ORACLES["simhash128_docs"] = SIMHASH128_SQL
QUERIES["simhash128_hamming_pairs"] = simhash128_hamming_pairs
# oracle = the INDEPENDENT all-pairs derivation over the 128-bit
# signatures: hash-matching proves the combined-block pigeonhole
# lost nothing
ORACLES["simhash128_hamming_pairs"] = SIMHASH128_HAMMING_SQL
