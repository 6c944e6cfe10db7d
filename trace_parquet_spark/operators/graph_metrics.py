"""Graph metrics over the duplicate-pair graph: triangle counting and
degree distribution — the structural health checks run on similarity
graphs before trusting their clusters (a near-dup graph whose degree
distribution explodes usually means the blocking key collapsed).

Edges: the same prefix-fingerprint duplicate pairs plans/recursive.py
closes over (all increasing (doc_a, doc_b) pairs within a group).
The reference has no graph anything; dedup_clusters (connected
components) is the third member of this family.

Scale: edges derive from one fingerprint aggregation (linear); the
triangle join is edge ⋈ edge ⋈ edge on node keys — bounded by group
sizes here, and in general the standard distributed triangle-count
shape (order edges by id so each triangle is built exactly once, no
direction double-counting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

# the same normalizer pair used by plans/recursive.py
_SPARK_NORM = (
    r"concat_ws(' ', slice(split(regexp_replace(lower(trim(text)),"
    r" '\\s+', ' '), ' '), 1, 2))"
)
_DUCK_NORM = (
    r"array_to_string(list_slice(string_split(regexp_replace("
    r"lower(trim(text)), '\s+', ' ', 'g'), ' '), 1, 2), ' ')"
)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select("doc_id", F.expr(f"md5({_SPARK_NORM})").alias("fp"))
    a = fps.select(F.col("fp").alias("fpa"), F.col("doc_id").alias("a"))
    b = fps.select(F.col("fp").alias("fpb"), F.col("doc_id").alias("b"))
    return a.join(
        b, (F.col("fpa") == F.col("fpb")) & (F.col("a") < F.col("b"))
    ).select("a", "b")


_EDGES_CTE = f"""
fps AS (
  SELECT doc_id, md5({_DUCK_NORM}) AS fp FROM documents
), edges AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM fps x JOIN fps y ON x.fp = y.fp AND x.doc_id < y.doc_id
)
"""


def triangle_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every triangle (a < b < c) in the duplicate graph, built once:
    edges ordered by id make e1=(a,b), e2=(b,c), e3=(a,c) the unique
    representation of each triangle."""
    e = _edges(spark, sf_dir)
    e1 = e.select(F.col("a").alias("ta"), F.col("b").alias("tb"))
    e2 = e.select(F.col("a").alias("tb2"), F.col("b").alias("tc"))
    e3 = e.select(F.col("a").alias("ta3"), F.col("b").alias("tc3"))
    return (
        e1.join(e2, F.col("tb") == F.col("tb2"))
        .join(
            e3,
            (F.col("ta") == F.col("ta3")) & (F.col("tc") == F.col("tc3")),
        )
        .select(
            F.col("ta").alias("doc_a"),
            F.col("tb").alias("doc_b"),
            F.col("tc").alias("doc_c"),
        )
        .orderBy("doc_a", "doc_b", "doc_c")
    )


TRIANGLE_SQL = f"""
WITH {_EDGES_CTE}
SELECT e1.a AS doc_a, e1.b AS doc_b, e2.b AS doc_c
FROM edges e1
JOIN edges e2 ON e1.b = e2.a
JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
ORDER BY doc_a, doc_b, doc_c
"""


def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of node degrees in the duplicate graph — the one-line
    sanity check that blocking keys haven't collapsed (a hot key shows
    up as a heavy tail here long before a join explodes downstream)."""
    e = _edges(spark, sf_dir)
    nodes = e.select(F.col("a").alias("doc_id")).unionAll(
        e.select(F.col("b").alias("doc_id"))
    )
    deg = nodes.groupBy("doc_id").agg(F.count("*").alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy("degree")
    )


DEGREE_SQL = f"""
WITH {_EDGES_CTE}, nodes AS (
  SELECT a AS doc_id FROM edges
  UNION ALL
  SELECT b AS doc_id FROM edges
), deg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS degree
  FROM nodes GROUP BY doc_id
)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg
GROUP BY degree
ORDER BY degree
"""



def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node with degree >= 2:
    cc(v) = 2·t(v) / (deg(v)·(deg(v)−1)), where t(v) counts triangles
    through v. Completes the structural-health family (degrees say how
    connected, triangles say how clumped; cc says it per node — near-1
    means tight duplicate cliques, near-0 means chains from transitive
    fingerprint drift).

    Exactness: t and deg are integers; cc is one double division of
    exact ints, bit-equal cross-engine. Scale: rides the same
    edge ⋈ edge ⋈ edge triangle join as triangle_list (each triangle
    materialized once via a<b<c ordering, then exploded to its three
    corners — a constant 3× fan-out), plus one count per node key."""
    e = _edges(spark, sf_dir)
    e1 = e.select(F.col("a").alias("ta"), F.col("b").alias("tb"))
    e2 = e.select(F.col("a").alias("tb2"), F.col("b").alias("tc"))
    e3 = e.select(F.col("a").alias("ta3"), F.col("b").alias("tc3"))
    tri = (
        e1.join(e2, F.col("tb") == F.col("tb2"))
        .join(
            e3,
            (F.col("ta") == F.col("ta3")) & (F.col("tc") == F.col("tc3")),
        )
        .select("ta", "tb", "tc")
    )
    tri_nodes = (
        tri.select(F.col("ta").alias("doc_id"))
        .unionAll(tri.select(F.col("tb").alias("doc_id")))
        .unionAll(tri.select(F.col("tc").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tri"))
    )
    deg = (
        e.select(F.col("a").alias("doc_id"))
        .unionAll(e.select(F.col("b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").alias("degree"))
        .where(F.col("degree") >= 2)
    )
    return (
        deg.join(tri_nodes, "doc_id", "left")
        .select(
            "doc_id",
            "degree",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
        )
        .withColumn(
            "cc",
            (F.lit(2) * F.col("n_tri")).cast("double")
            / (F.col("degree") * (F.col("degree") - F.lit(1))).cast("double"),
        )
        .orderBy("doc_id")
    )


CLUSTERING_SQL = f"""
WITH {_EDGES_CTE},
tri AS (
  SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
), tri_nodes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri
  FROM (
    SELECT ta AS doc_id FROM tri
    UNION ALL SELECT tb FROM tri
    UNION ALL SELECT tc FROM tri
  ) GROUP BY doc_id
), deg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS degree
  FROM (
    SELECT a AS doc_id FROM edges
    UNION ALL SELECT b FROM edges
  ) GROUP BY doc_id
  HAVING count(*) >= 2
)
SELECT d.doc_id, d.degree,
       coalesce(t.n_tri, 0) AS n_tri,
       CAST(2 * coalesce(t.n_tri, 0) AS DOUBLE)
         / CAST(d.degree * (d.degree - 1) AS DOUBLE) AS cc
FROM deg d LEFT JOIN tri_nodes t ON d.doc_id = t.doc_id
ORDER BY d.doc_id
"""

QUERIES = {
    "clustering_coefficient": clustering_coefficient,
    "triangle_list": triangle_list,
    "degree_distribution": degree_distribution,
}

ORACLES = {
    "clustering_coefficient": CLUSTERING_SQL,
    "triangle_list": TRIANGLE_SQL,
    "degree_distribution": DEGREE_SQL,
}
