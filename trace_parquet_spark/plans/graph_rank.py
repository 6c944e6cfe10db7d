"""PageRank over the nation-level trade graph, in exact integer
arithmetic so a fixed number of power iterations is bit-identical
across engines (the DuckDB oracle unrolls the same three iterations as
chained CTEs).

Graph: one directed edge supplier-nation -> customer-nation per
distinct trading pair, weighted by lineitem count (lineitem joined to
supplier for the source nation and through orders/customer for the
destination). The reference engine has nothing iterative
(repository/ParameterDataRepository.java:53-78); this extends the dedup-graph
family (triangle_list, dedup_clusters) with a link-analysis rank, the
shape used to weight crawl frontiers when prioritizing training-data
acquisition.

Determinism: floats never appear. Edge weights are collapsed to
per-edge transition probabilities scaled to 1e6 (``(w * PSCALE) div
out_w`` — truncating integer division, identical in Spark's ``div``
and DuckDB's ``//`` for the all-positive operands here), ranks live on
a 1e12 integer scale, and every iteration is ``(15*r0 + 85*sum) div
100`` in BIGINT. Dangling-node mass (a nation with no outgoing trade —
impossible at sf>=0.01 but handled) simply decays, the standard
simplification; both engines agree because the formula is shared.

Overflow headroom: rank <= 1e12, p <= 1e6, so rank*p <= 1e18 < 2^63;
contributions are summed over <= N=25 in-edges after the div, keeping
every intermediate within BIGINT regardless of raw edge weights — the
probability normalization is what makes the arithmetic safe at 100 TB
(raw ``rank * weight`` would overflow once weights pass ~1e8).

Scale: the only big job is the edge aggregation — lineitem joined to
three dimensions (supplier/orders/customer; supplier+customer
broadcast, orders shuffle-joined on the lineitem key) collapsed to
<= N^2 = 625 weighted edges. The power iterations run on that tiny
relation (broadcast both sides), so iteration count adds no scans of
the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from ..session import track_cache, tracked_local_checkpoint

SCALE = 10**12
PSCALE = 10**6
ITERS = 3
DAMP_NUM, DAMP_DEN = 85, 100


def _trade_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edges (src, dst, p): transition probability scaled to PSCALE."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("src")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("dst")
    )
    flows = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    outw = flows.groupBy("src").agg(F.sum("w").alias("ow"))
    return (
        flows.join(F.broadcast(outw), "src")
        .select("src", "dst", F.expr(f"(w * {PSCALE}) div ow").alias("p"))
    )


def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three exact-integer power iterations over the trade graph;
    returns every nation with its scaled rank (sums to <= SCALE; the
    teleport term restores 15% each round)."""
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"), "n_name"
    )
    n_nodes = nation.count()  # 25-row dimension; a driver count is fine
    r0 = SCALE // n_nodes

    # <= N^2 rows, referenced by every iteration's plan subtree: cache
    # so the lineitem edge aggregation runs ONCE, not once per
    # iteration (the iteration subtrees are identical analyzed plans,
    # so they all hit this cache entry)
    probs = _trade_probs(spark, sf_dir).transform(track_cache)
    ranks = nation.select("node", F.lit(r0).cast("long").alias("rank"))
    for _ in range(ITERS):
        contribs = (
            probs.join(
                F.broadcast(ranks), probs.src == ranks.node
            )
            .select("dst", F.expr(f"(rank * p) div {PSCALE}").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nation.select("node")
            .join(F.broadcast(contribs), F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                F.expr(
                    f"({DAMP_DEN - DAMP_NUM} * cast({r0} as bigint)"
                    f" + {DAMP_NUM} * coalesce(c, cast(0 as bigint)))"
                    f" div {DAMP_DEN}"
                ).alias("rank"),
            )
        )
    return (
        nation.join(F.broadcast(ranks), "node")
        .select("n_name", F.col("rank").alias("rank_scaled"))
        .orderBy(F.desc("rank_scaled"), "n_name")
    )


def _iter_ctes() -> str:
    """r1..rN CTEs, each one integer power iteration off the previous."""
    parts = []
    for i in range(1, ITERS + 1):
        prev = "r0" if i == 1 else f"r{i - 1}"
        parts.append(
            f"""c{i} AS (
  SELECT p.dst, CAST(sum((r.rank * p.p) // {PSCALE}) AS BIGINT) AS c
  FROM p JOIN {prev} r ON p.src = r.node GROUP BY p.dst
), r{i} AS (
  SELECT n.node,
         CAST(({DAMP_DEN - DAMP_NUM} * (SELECT rank FROM init)
               + {DAMP_NUM} * COALESCE(c.c, 0)) // {DAMP_DEN} AS BIGINT) AS rank
  FROM r0 n LEFT JOIN c{i} c ON n.node = c.dst
)"""
        )
    return ",\n".join(parts)


PAGERANK_SQL = f"""
WITH flows AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders   o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey  = c.c_custkey
  GROUP BY s.s_nationkey, c.c_nationkey
), outw AS (
  SELECT src, sum(w) AS ow FROM flows GROUP BY src
), p AS (
  SELECT f.src, f.dst, CAST((f.w * {PSCALE}) // o.ow AS BIGINT) AS p
  FROM flows f JOIN outw o ON f.src = o.src
), init AS (
  SELECT CAST({SCALE} // count(*) AS BIGINT) AS rank FROM nation
), r0 AS (
  SELECT n_nationkey AS node, (SELECT rank FROM init) AS rank FROM nation
),
{_iter_ctes()}
SELECT n.n_name, r.rank AS rank_scaled
FROM r{ITERS} r JOIN nation n ON n.n_nationkey = r.node
ORDER BY rank_scaled DESC, n.n_name
"""


BFS_P_MIN = 50_000  # keep edges with transition probability >= 5% of PSCALE
BFS_MAX_DEPTH = 25


def bfs_trade_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS shortest-hop levels over the sparsified trade
    graph: edges are trading pairs whose transition probability clears
    BFS_P_MIN (self-loops dropped), every nation is a root, and the
    answer is the first wave at which each (root, node) pair is
    reached — the complement of dup_chain_closure's reachability
    fixpoint (closure asks *whether*, BFS asks *how far*).

    Iterative dataflow, the standard distributed frontier shape: state
    is the (root, node) frontier plus the visited set; each wave is
    frontier ⋈ edges followed by an anti-join against visited. At
    cluster scale frontier and visited hash-partition on (root, node)
    so the anti-join is co-partitioned, the edge relation broadcasts
    when it fits (it is N² at most after the nation-level collapse),
    and the loop runs diameter-many waves — each wave touches only the
    newly-reached pairs, never the fact table (one edge-building scan
    up front, same as pagerank_trade_graph)."""
    edges = (
        _trade_probs(spark, sf_dir)
        .where((F.col("p") >= BFS_P_MIN) & (F.col("src") != F.col("dst")))
        .select(F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst"))
        .transform(track_cache)
    )
    roots = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("root")
    )
    frontier = roots.select(
        "root", F.col("root").alias("node"), F.lit(0).cast("long").alias("level")
    ).transform(tracked_local_checkpoint)
    best = frontier
    for depth in range(1, BFS_MAX_DEPTH + 1):
        # localCheckpoint truncates the per-wave lineage: without it the
        # optimizer re-derives the whole union-of-waves plan each round
        # (constraint propagation grows super-linearly with depth).
        nxt = (
            frontier.join(F.broadcast(edges), frontier.node == edges.src)
            .select("root", F.col("dst").alias("node"))
            .distinct()
            .join(best.select("root", "node"), ["root", "node"], "left_anti")
            .select(
                "root", "node", F.lit(depth).cast("long").alias("level")
            )
            .transform(tracked_local_checkpoint)
        )
        if nxt.isEmpty():
            break
        best = best.union(nxt).transform(tracked_local_checkpoint)
        frontier = nxt
    return best.orderBy("root", "node")


BFS_SQL = f"""
WITH RECURSIVE flows AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders   o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey  = c.c_custkey
  GROUP BY s.s_nationkey, c.c_nationkey
), outw AS (
  SELECT src, sum(w) AS ow FROM flows GROUP BY src
), edges AS (
  SELECT CAST(f.src AS BIGINT) AS src, CAST(f.dst AS BIGINT) AS dst
  FROM flows f JOIN outw o ON f.src = o.src
  WHERE (f.w * {PSCALE}) // o.ow >= {BFS_P_MIN} AND f.src <> f.dst
), walk(root, node, level) AS (
  SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
         CAST(0 AS BIGINT)
  FROM nation
  UNION
  SELECT w.root, e.dst, CAST(w.level + 1 AS BIGINT)
  FROM walk w JOIN edges e ON w.node = e.src
  WHERE w.level < {BFS_MAX_DEPTH}
)
SELECT root, node, CAST(min(level) AS BIGINT) AS level
FROM walk GROUP BY root, node
ORDER BY root, node
"""



SSSP_ROUNDS = 6  # Bellman-Ford relaxation rounds (>= sparsified diameter)
COST_SCALE = PSCALE * PSCALE  # edge cost = inverse transition probability


def sssp_trade_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths from every nation over
    the sparsified trade graph (bfs_trade_levels' edges), minimizing
    total inverse-transition-probability cost — "cheapest trade
    route" where rarely-used links cost more. BFS answers hops; this
    answers weighted distance.

    Exact by construction: edge cost = COST_SCALE // p is an integer,
    path costs are sums of <= SSSP_ROUNDS integers, and min is
    order-independent — no float ever appears. SSSP_ROUNDS fixed
    relaxation rounds of textbook distributed Bellman-Ford
    (state ⋈ edges, union, min per (root, node)); after round k the
    state holds exact shortest costs over paths of <= k edges, so any
    k >= diameter yields true shortest paths. The oracle replays the
    same rounds as chained CTEs (the pagerank _iter_ctes pattern) —
    fixed-round semantics, not an unbounded fixpoint, so both sides
    terminate deterministically even if a cost-improving cycle lurks.

    Scale: the nation-collapsed edge relation is <= N² rows and
    broadcasts; state is (roots × nodes), hash-partitioned on the
    grouping key, so each round is one co-partitioned min-agg — the
    same shape as the BFS loop but carrying costs. localCheckpoint
    truncates per-round lineage (constraint propagation otherwise
    grows superlinearly with rounds)."""
    edges = (
        _trade_probs(spark, sf_dir)
        .where((F.col("p") >= BFS_P_MIN) & (F.col("src") != F.col("dst")))
        .select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.expr(f"CAST({COST_SCALE} div p AS LONG)").alias("cost"),
        )
        .transform(track_cache)
    )
    state = (
        load_table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").cast("long").alias("root"),
            F.col("n_nationkey").cast("long").alias("node"),
            F.lit(0).cast("long").alias("dist"),
        )
        .transform(tracked_local_checkpoint)
    )
    for _ in range(SSSP_ROUNDS):
        relaxed = (
            state.join(F.broadcast(edges), state.node == edges.src)
            .select("root", F.col("dst").alias("node"),
                    (F.col("dist") + F.col("cost")).alias("dist"))
        )
        state = (
            state.unionAll(relaxed)
            .groupBy("root", "node")
            .agg(F.min("dist").alias("dist"))
            .transform(tracked_local_checkpoint)
        )
    return state.orderBy("root", "node")


def _sssp_iter_ctes() -> str:
    # MATERIALIZED is load-bearing: each d{k} references d{k-1} twice
    # (carry + relax), and DuckDB's default CTE inlining would expand
    # the whole join pipeline 2^ROUNDS times — at sf0.1 that spilled
    # >79 GB and failed; materialized, each round is one tiny 25×25
    # relation evaluated once.
    steps = []
    for k in range(1, SSSP_ROUNDS + 1):
        steps.append(f"""d{k} AS MATERIALIZED (
  SELECT root, node, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT root, node, dist FROM d{k - 1}
    UNION ALL
    SELECT d.root, e.dst AS node, d.dist + e.cost AS dist
    FROM d{k - 1} d JOIN edges e ON d.node = e.src
  ) GROUP BY root, node
)""")
    return ",\n".join(steps)


SSSP_SQL = f"""
WITH flows AS MATERIALIZED (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders   o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey  = c.c_custkey
  GROUP BY s.s_nationkey, c.c_nationkey
), outw AS (
  SELECT src, sum(w) AS ow FROM flows GROUP BY src
), edges AS MATERIALIZED (
  SELECT CAST(f.src AS BIGINT) AS src, CAST(f.dst AS BIGINT) AS dst,
         CAST({COST_SCALE} // ((f.w * {PSCALE}) // o.ow) AS BIGINT) AS cost
  FROM flows f JOIN outw o ON f.src = o.src
  WHERE (f.w * {PSCALE}) // o.ow >= {BFS_P_MIN} AND f.src <> f.dst
), d0 AS MATERIALIZED (
  SELECT CAST(n_nationkey AS BIGINT) AS root,
         CAST(n_nationkey AS BIGINT) AS node,
         CAST(0 AS BIGINT) AS dist
  FROM nation
),
{_sssp_iter_ctes()}
SELECT root, node, dist FROM d{SSSP_ROUNDS}
ORDER BY root, node
"""

QUERIES = {
    "pagerank_trade_graph": pagerank_trade_graph,
    "bfs_trade_levels": bfs_trade_levels,
    "sssp_trade_costs": sssp_trade_costs,
}
ORACLES = {
    "pagerank_trade_graph": PAGERANK_SQL,
    "bfs_trade_levels": BFS_SQL,
    "sssp_trade_costs": SSSP_SQL,
}


# ---------------------------------------------------------------------------
# Label-propagation community detection (Raghavan et al. 2007), made
# deterministic: synchronous rounds, frequency vote with ties broken by
# the SMALLEST label, isolated nodes keep their label. Fixed LP_ROUNDS
# keeps both engines bit-identical (async/random LP converges faster
# but is nondeterministic — wrong trade for a correctness-gated op).
# ---------------------------------------------------------------------------

LP_ROUNDS = 4


def _sym_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric closure of the sparsified trade edges — LP is defined
    on an undirected graph, so each kept pair votes both ways."""
    e = (
        _trade_probs(spark, sf_dir)
        .where((F.col("p") >= BFS_P_MIN) & (F.col("src") != F.col("dst")))
        .select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
    )
    return (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )


def label_propagation_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Communities on the trade graph via synchronous label
    propagation: every node starts as its own label; each round a node
    adopts the most frequent label among its neighbors (ties → the
    smallest label; no neighbors → keep). LP_ROUNDS fixed rounds, then
    report each node's community plus the community size.

    Scale shape: ONE fact-table scan builds the nation-collapsed edge
    relation (≤ N² rows); every round is edges ⋈ labels → (node,
    label) count → per-node top-1 window — all on label-sized
    relations, broadcastable, never touching lineitem again. At a
    100 TB scale the same loop runs on a user- or domain-grain graph:
    labels hash-partition on node, the vote groupBy map-side combines,
    and rounds stay O(E) with no frontier blowup (unlike CC's
    pair-relation, LP state is exactly one row per node)."""
    from pyspark.sql import Window

    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("node"), "n_name"
    )
    edges = _sym_edges(spark, sf_dir).transform(track_cache)
    labels = nation.select("node", F.col("node").alias("label"))
    pick = Window.partitionBy("dst").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(LP_ROUNDS):
        votes = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst", "label")
            .agg(F.count("*").alias("c"))
            .withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("node"), F.col("label").alias("won"))
        )
        labels = (
            labels.join(votes, "node", "left")
            .select("node", F.coalesce("won", "label").alias("label"))
            .transform(tracked_local_checkpoint)  # truncate per-round lineage
        )
    out = nation.join(labels, "node").select(
        "node", "n_name", F.col("label").alias("community")
    )
    size_w = Window.partitionBy("community")
    return (
        out.withColumn(
            "community_size", F.count("*").over(size_w).cast("long")
        )
        .orderBy("community", "node")
    )


def _lp_iter_ctes() -> str:
    # MATERIALIZED for the same reason as the SSSP oracle: l{k}
    # references l{k-1} twice (vote + keep), and default CTE inlining
    # would re-derive the edge pipeline 2^ROUNDS times.
    steps = []
    for k in range(1, LP_ROUNDS + 1):
        steps.append(f"""l{k} AS MATERIALIZED (
  SELECT p.node, CAST(COALESCE(w.label, p.label) AS BIGINT) AS label
  FROM l{k - 1} p
  LEFT JOIN (
    SELECT dst AS node, label FROM (
      SELECT e.dst, l.label,
             row_number() OVER (
               PARTITION BY e.dst
               ORDER BY count(*) DESC, l.label
             ) AS rn
      FROM edges_sym e JOIN l{k - 1} l ON e.src = l.node
      GROUP BY e.dst, l.label
    ) v WHERE rn = 1
  ) w ON w.node = p.node
)""")
    return ",\n".join(steps)


LP_SQL = f"""
WITH flows AS MATERIALIZED (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders   o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey  = c.c_custkey
  GROUP BY s.s_nationkey, c.c_nationkey
), outw AS (
  SELECT src, sum(w) AS ow FROM flows GROUP BY src
), dir_edges AS (
  SELECT CAST(f.src AS BIGINT) AS src, CAST(f.dst AS BIGINT) AS dst
  FROM flows f JOIN outw o ON f.src = o.src
  WHERE (f.w * {PSCALE}) // o.ow >= {BFS_P_MIN} AND f.src <> f.dst
), edges_sym AS MATERIALIZED (
  SELECT src, dst FROM dir_edges
  UNION
  SELECT dst AS src, src AS dst FROM dir_edges
), l0 AS MATERIALIZED (
  SELECT CAST(n_nationkey AS BIGINT) AS node,
         CAST(n_nationkey AS BIGINT) AS label
  FROM nation
),
{_lp_iter_ctes()}
SELECT l.node, n.n_name, l.label AS community,
       CAST(count(*) OVER (PARTITION BY l.label) AS BIGINT)
         AS community_size
FROM l{LP_ROUNDS} l JOIN nation n ON n.n_nationkey = l.node
ORDER BY community, node
"""

QUERIES["label_propagation_communities"] = label_propagation_communities
ORACLES["label_propagation_communities"] = LP_SQL


# --------------------------------------------------------------------------
# k-core decomposition (capped coreness) on the trade graph
# --------------------------------------------------------------------------

KCORE_KS = (2, 3, 4)    # peeled cores; 1-core = degree >= 1 (no cascade)
KCORE_MAX_ROUNDS = 26   # > |nation| -- peel removes >= 1 node per round


def k_core_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped coreness per nation on the symmetric sparsified trade
    graph: coreness(v) = max k ≤ 4 with v in the k-core, where the
    k-core is the maximal subgraph of minimum degree ≥ k (iterative
    peel: drop nodes whose CURRENT degree in the surviving subgraph is
    < k until fixpoint — removal cascades, which is what separates
    this from a plain degree threshold). The density screen of the
    graph family: dedup/link graphs use it to find the boilerplate
    hairball before pair-expansion.

    Spark shape: one fact-scan edge build (shared _sym_edges), then
    per k a fixpoint loop over node-grain state — each round is
    edges ⋈ alive (both endpoints) → per-node degree → HAVING ≥ k,
    with localCheckpoint truncating lineage; rounds stop at the first
    unchanged count and are bounded by |V| (peel drops ≥ 1 node per
    productive round). The oracle unrolls the same peel to the bound —
    extra rounds past the fixpoint are no-ops, so fixed-depth replay
    equals the early-exit loop by construction."""
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("node"), "n_name"
    )
    edges = _sym_edges(spark, sf_dir).transform(track_cache)
    degree = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )
    members: dict[int, DataFrame] = {}
    for k in KCORE_KS:
        alive = nation.select("node")
        n_alive = alive.count()
        for _ in range(KCORE_MAX_ROUNDS):
            surv = alive.select(F.col("node").alias("_s"))
            nxt = (
                edges.join(alive, edges.dst == alive.node)
                .join(surv, edges.src == F.col("_s"))
                .groupBy("node")
                .agg(F.count("*").alias("d"))
                .filter(F.col("d") >= k)
                .select("node")
                .transform(tracked_local_checkpoint)
            )
            n_next = nxt.count()
            alive = nxt
            if n_next == n_alive:
                break
            n_alive = n_next
        else:
            raise AssertionError(f"k-core peel (k={k}) did not converge")
        members[k] = alive.select(
            "node", F.lit(1).alias(f"in{k}")
        )
    out = nation.join(degree, "node", "left").fillna(0, ["degree"])
    for k in KCORE_KS:
        out = out.join(members[k], "node", "left")
    coreness = (
        F.when(F.col("in4").isNotNull(), 4)
        .when(F.col("in3").isNotNull(), 3)
        .when(F.col("in2").isNotNull(), 2)
        .when(F.col("degree") >= 1, 1)
        .otherwise(0)
    )
    return out.select(
        "node",
        "n_name",
        F.col("degree").cast("long").alias("degree"),
        coreness.cast("long").alias("coreness"),
    ).orderBy("node")


def _kcore_peel_ctes(k: int) -> str:
    steps = [f"""a{k}_0 AS MATERIALIZED (
  SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
)"""]
    for r in range(1, KCORE_MAX_ROUNDS + 1):
        steps.append(f"""a{k}_{r} AS MATERIALIZED (
  SELECT a.node
  FROM a{k}_{r - 1} a
  JOIN edges_sym e ON e.dst = a.node
  JOIN a{k}_{r - 1} s ON s.node = e.src
  GROUP BY a.node
  HAVING count(*) >= {k}
)""")
    return ",\n".join(steps)


def _kcore_sql() -> str:
    peels = ",\n".join(_kcore_peel_ctes(k) for k in KCORE_KS)
    last = {k: f"a{k}_{KCORE_MAX_ROUNDS}" for k in KCORE_KS}
    return f"""
WITH flows AS MATERIALIZED (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders   o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey  = c.c_custkey
  GROUP BY s.s_nationkey, c.c_nationkey
), outw AS (
  SELECT src, sum(w) AS ow FROM flows GROUP BY src
), dir_edges AS (
  SELECT CAST(f.src AS BIGINT) AS src, CAST(f.dst AS BIGINT) AS dst
  FROM flows f JOIN outw o ON f.src = o.src
  WHERE (f.w * {PSCALE}) // o.ow >= {BFS_P_MIN} AND f.src <> f.dst
), edges_sym AS MATERIALIZED (
  SELECT src, dst FROM dir_edges
  UNION
  SELECT dst AS src, src AS dst FROM dir_edges
), deg AS (
  SELECT dst AS node, CAST(count(*) AS BIGINT) AS degree
  FROM edges_sym GROUP BY dst
),
{peels}
SELECT CAST(n.n_nationkey AS BIGINT) AS node, n.n_name,
       CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree,
       CAST(CASE WHEN i4.node IS NOT NULL THEN 4
                 WHEN i3.node IS NOT NULL THEN 3
                 WHEN i2.node IS NOT NULL THEN 2
                 WHEN COALESCE(d.degree, 0) >= 1 THEN 1
                 ELSE 0 END AS BIGINT) AS coreness
FROM nation n
LEFT JOIN deg d ON d.node = n.n_nationkey
LEFT JOIN {last[2]} i2 ON i2.node = n.n_nationkey
LEFT JOIN {last[3]} i3 ON i3.node = n.n_nationkey
LEFT JOIN {last[4]} i4 ON i4.node = n.n_nationkey
ORDER BY node
"""


KCORE_SQL = _kcore_sql()

QUERIES["k_core_decomposition"] = k_core_decomposition
ORACLES["k_core_decomposition"] = KCORE_SQL

TRI_MIN_W = 2  # co-occurrence support threshold: denoises the graph


def triangle_count_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting on the part co-purchase graph —
    the canonical bounded-wedge algorithm (Suri & Vassilvitskii 2011,
    'Counting Triangles and the Curse of the Last Reducer'): nodes are
    parts, an undirected edge joins two parts bought together in at
    least TRI_MIN_W orders. Each edge is ORIENTED from the endpoint
    with the smaller (degree, id) to the larger, turning the graph
    into a DAG in which every triangle has exactly one source node —
    wedges are generated only at that source, so the join fan-out per
    node is bounded by its OUT-degree squared, and low-(degree,id)
    orientation caps out-degree at O(sqrt(m)) regardless of how
    skewed the raw degree distribution is (the 'last reducer' a
    hub-oriented enumeration would melt on at 100 TB). Count + a
    corner-id checksum (sum of u+v+w over triangles) gate the exact
    triangle SET against the oracle, not just its size.

    Plan shape: one self-join of the per-order part lists (shuffle on
    l_orderkey), one partial-agg edge count, degree agg joined back on
    the node key (node-grain, i.e. data-sized at large SF — so the
    join strategy is left to AQE/autoBroadcastJoinThreshold: broadcast
    while it fits, keyed shuffle join beyond), wedge self-join
    shuffled on the oriented source, and a final edge semi-join on the
    closing pair — every stage keyed, no global collect. The DuckDB oracle enumerates the
    same triangle set via the id-canonical u<v<w three-way join
    (orientation changes the enumeration plan, never the set)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= TRI_MIN_W)
        .select("u", "v")
    )
    pairs = pairs.localCheckpoint()  # reused 3x: edges, degrees, closing
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    # deg is node-grain (data-sized at large SF): no forced broadcast —
    # AQE/autoBroadcastJoinThreshold picks broadcast when it fits and a
    # keyed shuffle join when it doesn't
    ranked = pairs.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = (
        e1.join(e2, "src")
        .where(
            F.struct(F.col("e1.ddst"), F.col("e1.dst"))
            < F.struct(F.col("e2.ddst"), F.col("e2.dst"))
        )
        .select(
            "src",
            F.col("e1.dst").alias("x"),
            F.col("e2.dst").alias("y"),
        )
    )
    closing = oriented.select(
        F.col("src").alias("x"), F.col("dst").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"])
    agg = tris.agg(
        F.count("*").cast("long").alias("n_triangles"),
        F.coalesce(
            F.sum(F.col("src") + F.col("x") + F.col("y")), F.lit(0)
        )
        .cast("long")
        .alias("tri_key_sum"),
    )
    counts = pairs.agg(
        F.count("*").cast("long").alias("n_edges"),
    ).crossJoin(
        deg.agg(F.count("*").cast("long").alias("n_nodes"))
    )
    return counts.crossJoin(agg).select(
        "n_nodes", "n_edges", "n_triangles", "tri_key_sum"
    )


TRIANGLE_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {TRI_MIN_W}
), nodes AS (
  SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
), tris AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.u = e1.v
  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT (SELECT CAST(count(DISTINCT node) AS BIGINT) FROM nodes) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_triangles,
       CAST(coalesce(sum(a + b + c), 0) AS BIGINT) AS tri_key_sum
FROM tris
"""

QUERIES["triangle_count_parts"] = triangle_count_parts
ORACLES["triangle_count_parts"] = TRIANGLE_SQL
