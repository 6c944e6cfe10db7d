"""Join-strategy operators exposed at the query level: an explicit
Bloom-style prefilter join — hash the dimension keys into a bounded
bucket space, broadcast the distinct bucket set, and prune the fact
scan with a semi-join on the bucket BEFORE the shuffle; the exact join
afterwards removes the hash collisions (false positives).

This is a single-hash Bloom filter with the bit array materialized as
a distinct-bucket relation: membership admits false positives at rate
<= n_keys / NUM_BUCKETS, never false negatives, so the final inner
join makes the stage semantically invisible — which is what the DuckDB
oracle checks by running the plain join. Spark's AQE injects its own
runtime bloom filters (guarded in tests/test_plans.py) via the
optimizer-internal ``bloom_filter_agg``, which is NOT SQL-callable; a
pipeline author who wants the filter as an explicit, tunable, reusable
stage (e.g. the "dimension" is an earlier job's output and the fact
table is rescanned many times) builds exactly this shape.

Scale: the bucket set is <= min(n_keys, NUM_BUCKETS) ints — a few MB
broadcast even at 1e6 buckets — and the fact side drops non-matching
rows at the scan, so the join shuffle carries matches + epsilon
collisions instead of the full fact table. No repartition of the big
side, no second scan.

Reference: no counterpart (the reference's one query is a single-table
scan, repository/ParameterDataRepository.java:53-78); north-star
infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import grid_sum, grid_sum_sql

# ~430 urgent 1996 orders at sf0.01 -> false-positive rate ~4e-4; the
# same bucket space still gives <10% FP two orders of magnitude up.
NUM_BUCKETS = 1 << 20


def _bucket(col: str):
    return F.pmod(F.xxhash64(F.col(col)), F.lit(NUM_BUCKETS))


def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by return flag for lineitems of urgent 1996 orders, the
    fact scan pre-pruned by the broadcast bucket set of qualifying
    order-key hashes."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") == 1996)
        )
        .select("o_orderkey")
    )
    buckets = orders.select(_bucket("o_orderkey").alias("b")).distinct()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    pruned = li.withColumn("b", _bucket("l_orderkey")).join(
        F.broadcast(buckets), "b", "left_semi"
    )
    return (
        pruned.join(orders, pruned.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            grid_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


BLOOM_PREFILTER_SQL = f"""
SELECT l.l_returnflag,
       count(*) AS n_items,
       {grid_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
  AND year(o.o_orderdate) = 1996
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


QUERIES = {"bloom_prefilter_join": bloom_prefilter_join}
ORACLES = {"bloom_prefilter_join": BLOOM_PREFILTER_SQL}
