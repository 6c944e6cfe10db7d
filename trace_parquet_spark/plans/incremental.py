"""Incremental-maintenance query shapes: mergeable partial aggregates
and time-hierarchy rollups — the patterns that keep a 100 TB rollup
cheap to maintain (re-aggregate deltas, never recompute history).

The reference recomputes its single query from scratch per request
(repository/ParameterDataRepository.java:53-78 — stateless read); these cover
SURVEY §2.4's aggregation checklist from the maintenance side.

- ``incremental_agg_merge`` proves the algebraic-aggregate contract:
  per-key partials (count, exact integer sum) computed independently
  over a history slice and a delta slice, unioned and re-aggregated,
  must equal the direct full aggregation. This is exactly how a daily
  rollup absorbs a new day at scale: the history partials are a tiny
  stored table, only the delta touches raw data. The oracle IS the
  direct aggregation, so the gate checks merged == direct.
- ``time_rollup_counts`` is the hierarchical time dimension rollup
  (year → month → day) in ONE pass via ROLLUP over date_trunc columns
  — a single Expand + partial agg, not three scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

# deterministic history/delta split of the events change stream
_DELTA_MOD = 3


def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge per-user partial aggregates from a history slice and a
    delta slice; output the combined (n, total, mean).

    Scale: each slice aggregates map-side to per-user partials before
    the single shuffle; the union then re-aggregates rows that are
    already key-grained (2 rows per user max). History partials would
    be a stored table in production — the plan shape is identical.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("qv"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("pn"), F.sum("qv").alias("ps")
        )

    hist = partial(ev.filter(F.col("event_id") % _DELTA_MOD != 0))
    delta = partial(ev.filter(F.col("event_id") % _DELTA_MOD == 0))
    return (
        hist.unionByName(delta)
        .groupBy("user_id")
        .agg(F.sum("pn").alias("n_events"), F.sum("ps").alias("sum_q"))
        .select(
            "user_id",
            "n_events",
            (F.col("sum_q") / F.lit(100.0)).alias("total_value"),
            # exact ints → one double division each: bit-identical
            (F.col("sum_q") / F.col("n_events") / F.lit(100.0)).alias(
                "mean_value"
            ),
        )
        .orderBy("user_id")
    )


# The oracle is the DIRECT full aggregation — passing the gate proves
# merged-partials ≡ recompute (the algebraic-aggregate law).
INCREMENTAL_AGG_SQL = """
WITH q AS (
  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS qv
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT)                       AS n_events,
       CAST(sum(qv) AS BIGINT) / 100.0                AS total_value,
       CAST(sum(qv) AS DOUBLE) / count(*) / 100.0     AS mean_value
FROM q
GROUP BY user_id
ORDER BY user_id
"""


def time_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year→month→day hierarchical event counts in one ROLLUP pass.

    Scale: ROLLUP compiles to a single Expand (×4 grouping levels)
    feeding one partial-aggregated shuffle — at any size this touches
    events exactly once, vs 3 scans for per-level GROUP BYs.
    """
    ev = load_table(spark, sf_dir, "events")
    staged = ev.select(
        F.date_trunc("year", "ts").alias("y"),
        F.date_trunc("month", "ts").alias("m"),
        F.date_trunc("day", "ts").alias("d"),
        "value",
    )
    return (
        staged.rollup("y", "m", "d")
        .agg(
            F.count("*").alias("n_events"),
            F.grouping_id("y", "m", "d").cast("long").alias("lvl"),
        )
        .orderBy(
            F.col("y").asc_nulls_first(),
            F.col("m").asc_nulls_first(),
            F.col("d").asc_nulls_first(),
        )
    )


TIME_ROLLUP_SQL = """
WITH staged AS (
  SELECT date_trunc('year',  CAST(ts AS TIMESTAMP)) AS y,
         date_trunc('month', CAST(ts AS TIMESTAMP)) AS m,
         date_trunc('day',   CAST(ts AS TIMESTAMP)) AS d
  FROM events
)
SELECT y, m, d,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(grouping(y) * 4 + grouping(m) * 2 + grouping(d) AS BIGINT) AS lvl
FROM staged
GROUP BY ROLLUP (y, m, d)
ORDER BY y NULLS FIRST, m NULLS FIRST, d NULLS FIRST
"""


QUERIES = {
    "incremental_agg_merge": incremental_agg_merge,
    "time_rollup_counts": time_rollup_counts,
}

ORACLES = {
    "incremental_agg_merge": INCREMENTAL_AGG_SQL,
    "time_rollup_counts": TIME_ROLLUP_SQL,
}


def incremental_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: the materialized
    per-nation revenue view (orders ⋈ customer, aggregated by nation)
    absorbs a delta batch of new orders WITHOUT rejoining history —
    history partials + (Δorders ⋈ customer) partials, merged by key.
    The identity this relies on: equi-joins and algebraic aggregates
    both distribute over UNION of the fact table, so
    V(H ∪ Δ) = merge(V(H), V(Δ)). The oracle recomputes the view from
    the full fact table — the gate checks the incremental path lands
    on identical bytes.

    Scale: history never touches raw data again (its partials are a
    nation-sized stored table); only Δ is scanned and joined — the
    dimension broadcast makes the refresh cost O(|Δ|).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    hist = orders.filter(F.col("o_orderkey") % _DELTA_MOD != 0)
    delta = orders.filter(F.col("o_orderkey") % _DELTA_MOD == 0)

    def view_partial(o: DataFrame) -> DataFrame:
        return (
            o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
            .groupBy("c_nationkey")
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                        "long"
                    )
                ).alias("cents"),
            )
        )

    merged = (
        view_partial(hist)
        .unionAll(view_partial(delta))
        .groupBy("c_nationkey")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )
    return (
        merged.join(
            F.broadcast(nation), merged.c_nationkey == nation.n_nationkey
        )
        .select(
            "n_name",
            F.col("n").cast("long").alias("n_orders"),
            (F.col("cents") / F.lit(100.0)).alias("total_revenue"),
        )
        .orderBy("n_name")
    )


INCREMENTAL_JOIN_SQL = """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         / 100.0 AS total_revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""

QUERIES["incremental_join_refresh"] = incremental_join_refresh
ORACLES["incremental_join_refresh"] = INCREMENTAL_JOIN_SQL


def incremental_join_retractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance under inserts AND DELETES —
    the signed-multiplicity (Z-set / differential-dataflow) extension
    of incremental_join_refresh, which only handles growth: the
    per-nation revenue view absorbs one batch containing both new
    orders (weight +1) and retractions of history ('F'-status orders
    being cancelled, weight −1) without rejoining history. Algebraic
    aggregates absorb signed deltas directly — merge(V(H), ⊕signed Δ)
    — and a key whose maintained multiplicity reaches 0 is eliminated
    (never emitted as a ghost row), the property that makes signed
    deltas compose.

    The oracle recomputes the view from (H ∖ deletes) ∪ inserts — the
    incremental path must land on identical bytes.

    Scale: history partials are a nation-sized stored relation; the
    refresh joins only the delta (both signs) against the broadcast
    dimension — O(|Δ|) like the insert-only twin."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    hist = orders.filter(F.col("o_orderkey") % _DELTA_MOD != 0)
    inserts = orders.filter(F.col("o_orderkey") % _DELTA_MOD == 0).withColumn(
        "sgn", F.lit(1)
    )
    deletes = hist.filter(F.col("o_orderstatus") == "F").withColumn(
        "sgn", F.lit(-1)
    )

    def signed_partial(o: DataFrame) -> DataFrame:
        return (
            o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
            .groupBy("c_nationkey")
            .agg(
                F.sum("sgn").cast("long").alias("n"),
                F.sum(
                    F.col("sgn")
                    * F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                        "long"
                    )
                ).cast("long").alias("cents"),
            )
        )

    merged = (
        signed_partial(hist.withColumn("sgn", F.lit(1)))
        .unionAll(signed_partial(inserts.unionByName(deletes)))
        .groupBy("c_nationkey")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .where(F.col("n") > 0)  # multiplicity-zero elimination
    )
    return (
        merged.join(
            F.broadcast(nation), merged.c_nationkey == nation.n_nationkey
        )
        .select(
            "n_name",
            F.col("n").alias("n_orders"),
            (F.col("cents").cast("double") / F.lit(100.0)).alias("revenue"),
        )
        .orderBy("n_name")
    )


INCR_RETRACTIONS_SQL = f"""
WITH effective AS (
  SELECT * FROM orders
  WHERE o_orderkey % {_DELTA_MOD} = 0
     OR (o_orderkey % {_DELTA_MOD} <> 0 AND o_orderstatus <> 'F')
), v AS (
  SELECT c.c_nationkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM effective o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey
)
SELECT n.n_name,
       v.n AS n_orders,
       CAST(v.cents AS DOUBLE) / 100.0 AS revenue
FROM v JOIN nation n ON v.c_nationkey = n.n_nationkey
WHERE v.n > 0
ORDER BY n.n_name
"""

QUERIES["incremental_join_retractions"] = incremental_join_retractions
ORACLES["incremental_join_retractions"] = INCR_RETRACTIONS_SQL
