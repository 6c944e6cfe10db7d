"""Duplicate-cluster resolution: connected components over near-dup
pairs.

Pair generation (exact n-gram, minhash LSH, simhash) leaves a graph of
doc↔doc edges; the corpus rule "keep one representative per duplicate
CLUSTER" needs its connected components — pairwise greedy drops can
orphan chains (a~b, b~c but a!~c: dropping b's pairs alone may keep
both a and c even though they belong to one cluster through b).

Spark side: iterative min-label propagation — each round every node
takes the min label among itself and its neighbors; converges in
O(graph diameter) rounds. Each round is one join + one aggregation on
the (small) edge relation, the standard large-graph CC shape
(GraphFrames does the same under the hood); the vertex relation is
checkpoint-truncated each round via localCheckpoint to keep the plan
from growing.

Oracle: DuckDB WITH RECURSIVE reachability — label(v) = min(doc_id)
over all docs reachable from v — a genuinely different algorithm
arriving at the same fixpoint, which makes the hash match strong
evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup import DEDUP_MINHASH_SQL, dedup_minhash_lsh
from ..functions.hashing import stable_hash32, stable_hash32_sql
from ..session import track_cache, tracked_local_checkpoint
from ..sources.registry import load_table_parallel

MAX_ITERS = 20


def connected_components(edges: DataFrame, max_iters: int = MAX_ITERS) -> DataFrame:
    """(src, dst) undirected edges → (doc_id, cluster_id) with
    cluster_id = min doc_id in the component. Nodes appear only if
    they touch an edge.

    Min-label propagation needs ~diameter rounds; if the graph hasn't
    converged within ``max_iters`` this RAISES rather than returning
    silently-wrong labels (a 30-hop chain at the default cap used to do
    exactly that — caught by the equivalence test against
    ``connected_components_star``, which converges in O(log n) and is
    the variant to prefer on unknown-diameter graphs)."""
    converged = False
    sym = (
        edges.select(F.col("src"), F.col("dst"))
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .transform(track_cache)
    )
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # materialize FIRST (truncates lineage so the iterative plan
        # doesn't snowball), then run the convergence probe against the
        # checkpointed data — probing before the checkpoint would
        # execute the whole update plan twice per iteration
        materialized = updated.transform(tracked_local_checkpoint)
        changed = (
            materialized.alias("u")
            .join(labels.alias("l"), "doc_id")
            .filter(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .limit(1)
            .count()
        )
        labels = materialized
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} rounds "
            "(graph diameter exceeds the cap); raise max_iters or use "
            "connected_components_star"
        )
    return labels


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from the banded-LSH pair relation: one row per
    clustered doc with its component representative and size."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes, "cluster_id")
        .select("doc_id", "cluster_id", "cluster_size")
        .orderBy("doc_id")
    )


_PAIRS_BODY = DEDUP_MINHASH_SQL.rsplit("ORDER BY", 1)[0]

DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  {_PAIRS_BODY}
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT src AS doc_id, src AS r FROM edges
  UNION
  SELECT e.src AS doc_id, r.r
  FROM edges e JOIN reach r ON e.dst = r.doc_id
),
labels AS (
  SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
),
sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id
)
SELECT l.doc_id, l.cluster_id, s.cluster_size
FROM labels l JOIN sizes s ON l.cluster_id = s.cluster_id
ORDER BY l.doc_id
"""


QUERIES = {"dedup_clusters": dedup_clusters}
ORACLES = {"dedup_clusters": DEDUP_CLUSTERS_SQL}


def connected_components_star(
    edges: DataFrame, max_iters: int = MAX_ITERS
) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — same contract as ``connected_components`` ((src, dst)
    edges → (doc_id, cluster_id = component min)), but converging in
    O(log n) alternations instead of O(diameter) label rounds:

    - large-star(u): link every strictly-larger neighbor v to
      m(u) = min(N(u) ∪ {u});
    - small-star(u): link the smaller neighbors AND u itself to m(u).

    Each step is one join + one aggregation of the current edge
    relation; edges monotonically contract toward (member, root)
    stars. Min-label propagation needs ~diameter rounds — on a
    pathological chain at 100 TB that is thousands of shuffles; the
    star alternation is the shape you deploy at scale. Both
    implementations are kept and pytest asserts they agree on the LSH
    pair graph.
    """

    def sym(df: DataFrame) -> DataFrame:
        both = df.union(
            df.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        return both.filter(F.col("u") != F.col("v")).distinct()

    # m(u) = min(N(u) ∪ {u}) as a WINDOW over the edge relation
    # instead of the old groupBy + join-back (round-14, guide §2.1/
    # §3): the aggregate+join shape costs three exchanges at scale
    # (partial/final agg of e, then e and m re-shuffled for a
    # sort-merge join — m has one row per NODE, never broadcastable
    # on a real graph), where the window is ONE shuffle of e by u.
    # Locally that is one stage per star instead of agg+broadcast+
    # join (~1.5-2 s per CC call, measured paired across the four
    # benched consumers). Skew note: a hot node's edges land in one
    # window partition, but per-node degree in a near-dup pair graph
    # is bounded by cluster size − 1, and corpus-scale exact dedup
    # runs first (corpus_clean) precisely so no giant identical
    # cluster survives into the pair graph; the old join shape put
    # the same key in one reducer anyway.
    w_u = Window.partitionBy("u")

    def with_m(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "m", F.least(F.min("v").over(w_u), F.col("u"))
        )

    e = sym(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    ).transform(tracked_local_checkpoint)
    for _ in range(max_iters):
        em = with_m(e)
        large = sym(
            em.filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        ).transform(tracked_local_checkpoint)
        lm = with_m(large)
        small = sym(
            lm.filter(F.col("v") < F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            # "u itself links to m(u)": per-edge duplicates of (u, m)
            # are collapsed by sym's distinct, same relation as the
            # old one-row-per-u aggregate
            .union(lm.select("u", F.col("m").alias("v")))
        ).transform(tracked_local_checkpoint)
        # fixpoint: the symmetric edge sets are equal. Both relations
        # are DISTINCT by construction (sym ends in distinct), so set
        # difference via left_anti — broadcast-friendly, no hash
        # re-aggregation — replaces bag-semantics exceptAll; both
        # directions ride one union under a single limit(1) count, one
        # Spark job per round.
        done = (
            small.join(e, ["u", "v"], "left_anti")
            .select(F.lit(1).alias("d"))
            .union(
                e.join(small, ["u", "v"], "left_anti")
                .select(F.lit(1).alias("d"))
            )
            .limit(1)
            .count()
            == 0
        )
        e = small
        if done:
            break
    # e is now a star forest (symmetric): members point at their root,
    # the component min. Roots appear only on the small side of edges.
    members = (
        e.filter(F.col("v") < F.col("u"))
        .groupBy(F.col("u").alias("doc_id"))
        .agg(F.min("v").alias("cluster_id"))
    )
    roots = (
        e.select(F.col("u").alias("doc_id"))
        .distinct()
        .join(members, "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    return members.union(roots)


def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_clusters computed by the large-star/small-star algorithm —
    same result relation, same DuckDB oracle, genuinely different
    fixpoint construction (the O(log n)-round variant deployed when
    component diameters are unknown)."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components_star(pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes, "cluster_id")
        .select("doc_id", "cluster_id", "cluster_size")
        .orderBy("doc_id")
    )


QUERIES["dedup_clusters_star"] = dedup_clusters_star
ORACLES["dedup_clusters_star"] = DEDUP_CLUSTERS_SQL


# --------------------------------------------------------------------------
# leakage-free dataset split
# --------------------------------------------------------------------------

SPLIT_BUCKETS = 10
VAL_BUCKET = 8
TEST_BUCKET = 9


def _labels_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) from the banded-LSH pair graph via the
    large-star/small-star alternation — the O(log n)-round variant
    both downstream consumers (split assignment, canonical pick) use:
    same fixpoint as min-label propagation (pytest-pinned equivalence)
    at ~2.5s less wall on the sf0.1 graph, and the shape that survives
    unknown cluster diameters at scale."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return connected_components_star(pairs).select("doc_id", "cluster_id")


def split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment that can never leak a near-duplicate
    across splits: the split is hashed from each document's dedup-
    CLUSTER representative (connected components over the banded-LSH
    pair relation; unpaired docs are their own singleton rep), so
    every member of a near-dup cluster lands in the same split by
    construction. Random per-doc splits put ~2·dup_rate of eval
    tokens inside train-set near-dups — the classic eval-contamination
    failure this guard exists for.

    80/10/10 via the engine-portable md5 hash of the representative
    (stable across engines, runs, and cluster sizes — adding documents
    never reassigns an existing cluster's split)."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id"
    )
    labels = _labels_star(spark, sf_dir)
    # the label relation scales with near-dup count — no forced
    # broadcast; size/AQE decides
    rep = docs.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("rep"),
    )
    bucket = F.pmod(
        stable_hash32(F.concat(F.lit("split:"), F.col("rep"))),
        F.lit(SPLIT_BUCKETS),
    )
    return (
        rep.withColumn("bucket", bucket)
        .select(
            "doc_id",
            "rep",
            F.when(F.col("bucket") == VAL_BUCKET, "val")
            .when(F.col("bucket") == TEST_BUCKET, "test")
            .otherwise("train")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


_hash_rep = stable_hash32_sql("'split:' || CAST(rep AS VARCHAR)")

SPLIT_LEAKAGE_FREE_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  {_PAIRS_BODY}
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT src AS doc_id, src AS r FROM edges
  UNION
  SELECT e.src AS doc_id, r.r
  FROM edges e JOIN reach r ON e.dst = r.doc_id
),
labels AS (
  SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
),
rep AS (
  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS rep
  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
),
bucketed AS (
  SELECT doc_id, rep, {_hash_rep} % {SPLIT_BUCKETS} AS bucket
  FROM rep
)
SELECT doc_id, rep,
       CASE WHEN bucket = {VAL_BUCKET} THEN 'val'
            WHEN bucket = {TEST_BUCKET} THEN 'test'
            ELSE 'train' END AS split
FROM bucketed
ORDER BY doc_id
"""

QUERIES["split_leakage_free"] = split_leakage_free
ORACLES["split_leakage_free"] = SPLIT_LEAKAGE_FREE_SQL


# --------------------------------------------------------------------------
# quality-aware canonical selection
# --------------------------------------------------------------------------


def dedup_canonical_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pick each near-dup cluster's SURVIVOR by quality, not by id:
    the min-doc_id representative every CC emits is arbitrary — a
    production cleanup keeps the best copy (here: the longest, word
    count as the deterministic integer quality score; production swaps
    in any scalar score) and drops the rest. One row per cluster with
    the chosen canonical doc, its score, and how many copies it
    retires.

    Plan: cluster labels (banded-LSH pairs → star CC) ⋈ per-doc score,
    then a row_number window per cluster ordered by
    (score DESC, doc_id) — argmax with a total tie-break, so the
    choice is unique and engine-independent. The window partitions by
    cluster_id (never global); the score join shuffles the label
    relation once.

    Oracle: the WITH RECURSIVE reachability closure re-derives the
    clusters, then the same argmax — different CC algorithm, same
    fixpoint, same survivor."""
    cc = _labels_star(spark, sf_dir)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    labels = cc.join(sizes, "cluster_id")
    from ..functions.text import tokens

    score = load_table_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_words")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_words"), F.asc("doc_id")
    )
    return (
        labels.join(score, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_doc_id"),
            F.col("n_words").alias("canonical_words"),
            F.col("cluster_size").cast("long").alias("n_copies"),
        )
        .orderBy("cluster_id")
    )


from ..functions.text import tokens_sql as _tokens_sql  # noqa: E402

DEDUP_CANONICAL_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  {_PAIRS_BODY}
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT src AS doc_id, src AS r FROM edges
  UNION
  SELECT e.src AS doc_id, r.r
  FROM edges e JOIN reach r ON e.dst = r.doc_id
),
labels AS (
  SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
),
sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id
),
scored AS (
  SELECT l.cluster_id, l.doc_id,
         CAST(len({_tokens_sql("d.text")}) AS BIGINT) AS n_words,
         s.cluster_size
  FROM labels l
  JOIN sizes s ON l.cluster_id = s.cluster_id
  JOIN documents d ON l.doc_id = d.doc_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
                               ORDER BY n_words DESC, doc_id) AS rn
  FROM scored
)
SELECT cluster_id,
       doc_id  AS canonical_doc_id,
       n_words AS canonical_words,
       CAST(cluster_size AS BIGINT) AS n_copies
FROM ranked
WHERE rn = 1
ORDER BY cluster_id
"""

QUERIES["dedup_canonical_quality"] = dedup_canonical_quality
ORACLES["dedup_canonical_quality"] = DEDUP_CANONICAL_SQL


CLUSTER_CAP_K = 2  # survivors kept per near-dup cluster


def cluster_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep at most K best copies per near-dup cluster — the
    generalization of dedup_canonical_quality's argmax (K=1) that a
    training mix actually wants: full dedup throws away benign
    paraphrase diversity, no dedup overweights boilerplate; capping
    keeps the K highest-quality copies (word count, doc_id
    tie-break) and every unclustered doc. One row per SURVIVOR with
    its cluster, quality rank, and how many siblings were dropped.

    Plan shape: cluster labels (banded-LSH pairs → star CC) left-join
    the full doc relation (singletons label themselves), per-cluster
    rank window, rank ≤ K filter. The window partitions by cluster —
    never global; the label relation scales with near-dup count and
    is never force-broadcast (the house rule)."""
    from ..functions.text import tokens

    labels = _labels_star(spark, sf_dir)
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_words")
    )
    labeled = docs.join(labels, "doc_id", "left").select(
        "doc_id",
        "n_words",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_words"), F.asc("doc_id")
    )
    sized = labeled.withColumn("rn", F.row_number().over(w)).withColumn(
        "cluster_size",
        F.count("*").over(Window.partitionBy("cluster_id")),
    )
    return (
        sized.where(F.col("rn") <= CLUSTER_CAP_K)
        .select(
            "cluster_id",
            "doc_id",
            "n_words",
            F.col("rn").cast("long").alias("quality_rank"),
            (F.col("cluster_size") - F.least(
                F.col("cluster_size"), F.lit(CLUSTER_CAP_K).cast("long")
            )).cast("long").alias("n_dropped"),
        )
        .orderBy("cluster_id", "quality_rank")
    )


CLUSTER_CAPPED_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  {_PAIRS_BODY}
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT src AS doc_id, src AS r FROM edges
  UNION
  SELECT e.src AS doc_id, r.r
  FROM edges e JOIN reach r ON e.dst = r.doc_id
),
labels AS (
  SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
),
labeled AS (
  SELECT d.doc_id,
         CAST(len({_tokens_sql("d.text")}) AS BIGINT) AS n_words,
         coalesce(l.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_words DESC, doc_id) AS rn,
         CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cs
  FROM labeled
)
SELECT cluster_id, doc_id, n_words,
       CAST(rn AS BIGINT) AS quality_rank,
       CAST(cs - least(cs, {CLUSTER_CAP_K}) AS BIGINT) AS n_dropped
FROM ranked
WHERE rn <= {CLUSTER_CAP_K}
ORDER BY cluster_id, quality_rank
"""

QUERIES["cluster_capped_sample"] = cluster_capped_sample
ORACLES["cluster_capped_sample"] = CLUSTER_CAPPED_SQL
