"""Join-size estimation WITHOUT executing the join: for an equi-join,
|A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k) exactly — two per-key aggregations
and a tiny key-profile join, never the join itself. This is the
pre-flight check a 100 TB pipeline runs before committing to a shuffle
(and the tool that catches the quadratic self-join blowups this
repo's dedup operators guard against with document-frequency caps:
a hot shingle shared by S docs contributes S² pairs, visible here as
one row of the profile).

Three candidate joins are profiled: a sane FK join (lineitem⋈orders),
a mild self-join (events by user), and the cautionary shingle
self-join that motivates the df-cap in operators/dedup.py. Output per
join: input sizes, exact output cardinality, and the hottest key's
contribution — all BIGINT-exact (DECIMAL(38) for the products; a
single hot key squared can pass 2^63 long before the join could ever
run).

Scale: each estimate is one partial-agg shuffle per side on the join
key, then an aggregation of the (distinct-key-sized) profile — orders
of magnitude cheaper than the join it predicts.

Reference: no counterpart (single-query engine); planner
infrastructure for the north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles_from, shingles_sql, tokens
from ..sources.registry import load_table

SHINGLE_N = 3


def _estimate(left: DataFrame, right: DataFrame, key: str, name: str) -> DataFrame:
    dec = "decimal(38,0)"
    cl = left.groupBy(key).agg(F.count("*").alias("cl"))
    cr = right.groupBy(key).agg(F.count("*").alias("cr"))
    prof = cl.join(cr, key)
    return prof.agg(
        F.lit(name).alias("join_name"),
        F.sum("cl").cast("long").alias("left_rows_matched"),
        F.sum("cr").cast("long").alias("right_rows_matched"),
        F.sum(F.col("cl").cast(dec) * F.col("cr")).cast(dec).cast("double")
        .alias("est_out_rows"),
        F.max(F.col("cl").cast(dec) * F.col("cr")).cast("double")
        .alias("hottest_key_rows"),
    )


def join_size_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k")
    )
    sh = (
        load_table(spark, sf_dir, "documents")
        .select(tokens("text").alias("toks"))
        .select(F.explode(shingles_from(F.col("toks"), SHINGLE_N)).alias("k"))
    )
    return (
        _estimate(li, orders, "k", "lineitem_orders_fk")
        .unionAll(_estimate(ev, ev, "k", "events_self_user"))
        .unionAll(_estimate(sh, sh, "k", "shingle_self_join"))
        .orderBy("join_name")
    )


def _est_sql(left: str, right: str, name: str) -> str:
    return f"""
SELECT '{name}' AS join_name,
       CAST(sum(cl) AS BIGINT) AS left_rows_matched,
       CAST(sum(cr) AS BIGINT) AS right_rows_matched,
       CAST(sum(CAST(cl AS HUGEINT) * cr) AS DOUBLE) AS est_out_rows,
       CAST(max(CAST(cl AS HUGEINT) * cr) AS DOUBLE) AS hottest_key_rows
FROM (SELECT k, count(*) AS cl FROM {left} GROUP BY k) a
JOIN (SELECT k, count(*) AS cr FROM {right} GROUP BY k) b USING (k)
"""


_SHINGLE_REL = (
    f"(SELECT unnest({shingles_sql('text', SHINGLE_N)}) AS k FROM documents)"
)

JOIN_SIZE_SQL = f"""
WITH li AS (SELECT l_orderkey AS k FROM lineitem),
     o  AS (SELECT o_orderkey AS k FROM orders),
     ev AS (SELECT user_id AS k FROM events),
     sh AS (SELECT * FROM {_SHINGLE_REL})
{_est_sql("li", "o", "lineitem_orders_fk")}
UNION ALL
{_est_sql("ev", "ev", "events_self_user")}
UNION ALL
{_est_sql("sh", "sh", "shingle_self_join")}
ORDER BY join_name
"""


QUERIES = {"join_size_estimates": join_size_estimates}
ORACLES = {"join_size_estimates": JOIN_SIZE_SQL}


def choose_join_strategy(
    left: DataFrame,
    right: DataFrame,
    key: str,
    broadcast_max_rows: int = 1_000_000,
    skew_hot_ratio: int = 20,
) -> dict:
    """Pre-flight join planning from the exact cardinality profile:
    returns {"strategy", "est_out_rows", "right_rows", "hot_ratio"}
    where strategy is
      - "broadcast" when the right side fits the row budget,
      - "salted"    when one key's output share exceeds skew_hot_ratio×
                    the mean (operators/skew.py shapes apply),
      - "shuffle"   otherwise (plain sort-merge/hash shuffle join).
    One tiny stats job (three numbers collected); the decision maps
    onto broadcast()/with_salt hints at submission time — the manual
    twin of what AQE decides at runtime, available BEFORE the job runs
    so the DAG can be authored around it.
    """
    dec = "decimal(38,0)"
    cl = left.groupBy(key).agg(F.count("*").alias("cl"))
    cr = right.groupBy(key).agg(F.count("*").alias("cr"))
    prof = cl.join(cr, key)
    stats = prof.agg(
        F.sum(F.col("cl").cast(dec) * F.col("cr")).alias("est"),
        F.max(F.col("cl").cast(dec) * F.col("cr")).alias("hot"),
        F.count("*").alias("nkeys"),
    ).first()
    right_rows = right.count()
    est = int(stats["est"] or 0)
    hot = int(stats["hot"] or 0)
    nkeys = int(stats["nkeys"] or 0)
    mean = est / nkeys if nkeys else 0.0
    hot_ratio = hot / mean if mean else 0.0
    if right_rows <= broadcast_max_rows:
        strategy = "broadcast"  # skew irrelevant: no shuffle of left
    elif hot_ratio >= skew_hot_ratio:
        strategy = "salted"
    else:
        strategy = "shuffle"
    return {
        "strategy": strategy,
        "est_out_rows": est,
        "right_rows": right_rows,
        "hot_ratio": hot_ratio,
    }
