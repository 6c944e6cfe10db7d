"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting handles most cases at runtime
(session.py enables it); salting is the explicit fallback for
aggregations and for joins whose skew AQE can't see (e.g. a hot key
produced mid-pipeline). Pattern:

- salted aggregation: two-phase — partial agg on (key, salt), final
  agg on key. The hot key's rows spread over S reducers in phase 1.
- salted join: replicate the small side S× (one copy per salt), salt
  the big side randomly-but-deterministically, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table


def with_salt(
    df: DataFrame,
    key: str,
    buckets: int,
    salt_col: str = "__salt",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Content-derived salt: hash of ``salt_on`` columns (default: every
    column). Stable across task retries/stage recomputation — a salt fed
    into a shuffle key MUST be deterministic per row, or a fetch-failure
    retry can recompute rows into different buckets and silently drop or
    duplicate them (the classic nondeterministic-repartition hazard;
    monotonically_increasing_id/rand are both unsafe here). Exact
    duplicate rows share a salt, which only narrows spreading for
    identical rows — harmless for correctness."""
    cols = salt_on if salt_on is not None else df.columns
    return df.withColumn(
        salt_col,
        F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(buckets)).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[Column],
    partial_aggs: list[Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``partial_aggs`` run per (key, salt),
    ``aggs`` combine the partials per key. Caller supplies matching
    expression pairs, e.g. partial ``sum(x) as x_sum`` then final
    ``sum(x_sum) as x_sum``."""
    salted = with_salt(df, key, buckets)
    partial = salted.groupBy(key, "__salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Replicate-small / salt-big equi-join for skewed keys."""
    salts = big.sparkSession.range(buckets).select(
        F.col("id").cast("int").alias("__salt")
    )
    small_rep = small.crossJoin(F.broadcast(salts))
    big_salted = with_salt(big, key, buckets)
    return big_salted.join(small_rep, [key, "__salt"], how).drop("__salt")


def salted_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated proof that salted two-phase aggregation equals the
    direct groupBy: orders aggregated by the 5-value (maximally hot)
    o_orderpriority key through the salt → partial → final pipeline,
    hash-checked against the oracle's plain GROUP BY. Money summed on
    the cent grid as longs so the two-phase reassociation is exact."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "__cents", F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    )
    out = salted_agg(
        orders,
        "o_orderpriority",
        partial_aggs=[
            F.count("*").alias("n_part"),
            F.sum("__cents").alias("cents_part"),
        ],
        aggs=[
            F.sum("n_part").alias("n_orders"),
            (F.sum("cents_part") / F.lit(100.0)).alias("total_price"),
        ],
    )
    return out.select(
        "o_orderpriority", F.col("n_orders").cast("long").alias("n_orders"),
        "total_price",
    ).orderBy("o_orderpriority")


SALTED_AGG_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS total_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def salted_join_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated proof of the salted-JOIN path on a deliberately
    hot key: every orders row carries one of 5 priorities (~20% of the
    table each — the worst skew shape), and the dim side is derived
    MID-PIPELINE (an aggregate of orders itself), the case where AQE
    has no file statistics and a too-large-to-broadcast dim would
    otherwise funnel each hot key through one reducer. salted_join
    replicates the dim 8× and spreads each hot key over 8 shuffle
    buckets (plan-pinned in tests/test_scale_paths.py); the rollup
    after the join is hash-checked against the oracle's plain
    join+GROUP BY. Money on the cent grid as longs, so the salted
    re-association is exact."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("__cents"),
    )
    dim = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_in_priority")
    )
    joined = salted_join(orders, dim, "o_orderpriority", buckets=8)
    return (
        joined.groupBy("o_orderpriority", "n_in_priority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            (F.sum("__cents") / F.lit(100.0)).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


SALTED_JOIN_SQL = """
WITH dim AS (
  SELECT o_orderpriority, count(*) AS n_in_priority
  FROM orders GROUP BY 1
)
SELECT o.o_orderpriority,
       d.n_in_priority,
       count(*) AS n_orders,
       sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0
         AS total_price
FROM orders o JOIN dim d USING (o_orderpriority)
GROUP BY 1, 2
ORDER BY o_orderpriority
"""


QUERIES = {
    "salted_agg_orders": salted_agg_orders,
    "salted_join_priority_rollup": salted_join_priority_rollup,
}
ORACLES = {
    "salted_agg_orders": SALTED_AGG_SQL,
    "salted_join_priority_rollup": SALTED_JOIN_SQL,
}
