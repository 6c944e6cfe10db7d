"""Z-order (Morton) layout bucketing: map two clustering keys onto one
space-filling-curve coordinate so that sorting/partitioning by the
single z-value co-locates rows that are close in BOTH dimensions —
the standard multi-dimensional data-layout trick (Delta OPTIMIZE
ZORDER, Iceberg sort orders) that makes min/max zone maps (see
operators/indexing.py) effective for queries filtering on either key.

Everything is exact integer arithmetic, shared with the DuckDB oracle:
keys are min-max normalized to 8 bits via truncating division, bits
interleaved with shift/AND/OR, and the bucket is the top 6 Morton bits
(64 buckets). The driver query returns per-bucket row counts and
per-key min/max ranges — the ranges being narrow in both dimensions at
once is the measurable point of the curve (a sort on one key alone
leaves the other dimension's range at full width in every file).

Scale: one pass computes the z-value (pure codegen expressions), and
the bucket aggregation is one partial-agg shuffle of 64 groups. In a
real table rewrite the bucket becomes ``repartitionByRange(zvalue)``
followed by a sorted write — the same expression feeds both.

Reference: no counterpart (the reference writes one unpartitioned
file, service/ParquetConversionService.java:60-96); north-star
lakehouse-layout infrastructure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

BITS = 8  # per-dimension resolution
BUCKET_BITS = 6  # 64 layout buckets
_MAXV = (1 << BITS) - 1


def morton_interleave(a: Column, b: Column) -> Column:
    """Interleave the low BITS bits of a (odd positions) and b (even):
    built-in shift/AND expressions only — whole-stage codegen."""
    parts = []
    for i in range(BITS):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket lineitem by the Morton code of (l_orderkey, l_partkey)
    and report each bucket's row count and both key ranges."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    stats = li.agg(
        F.min("l_orderkey").alias("ok_lo"),
        F.max("l_orderkey").alias("ok_hi"),
        F.min("l_partkey").alias("pk_lo"),
        F.max("l_partkey").alias("pk_hi"),
    )
    normed = li.join(F.broadcast(stats)).select(
        "l_orderkey",
        "l_partkey",
        # truncating integer div (all-positive operands => same as
        # DuckDB's //); float division here could land one ulp above an
        # integer and floor() up across engines
        F.expr(
            f"((l_orderkey - ok_lo) * {_MAXV})"
            " div greatest(ok_hi - ok_lo, 1)"
        ).alias("na"),
        F.expr(
            f"((l_partkey - pk_lo) * {_MAXV})"
            " div greatest(pk_hi - pk_lo, 1)"
        ).alias("nb"),
    )
    z = morton_interleave(F.col("na"), F.col("nb"))
    return (
        normed.select(
            "l_orderkey",
            "l_partkey",
            F.shiftright(z, 2 * BITS - BUCKET_BITS).cast("long").alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_orderkey").alias("min_orderkey"),
            F.max("l_orderkey").alias("max_orderkey"),
            F.min("l_partkey").alias("min_partkey"),
            F.max("l_partkey").alias("max_partkey"),
        )
        .orderBy("bucket")
    )


def _duck_interleave(a: str, b: str) -> str:
    parts = []
    for i in range(BITS):
        parts.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        parts.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " | ".join(parts)


ZORDER_SQL = f"""
WITH stats AS (
  SELECT min(l_orderkey) AS ok_lo, max(l_orderkey) AS ok_hi,
         min(l_partkey)  AS pk_lo, max(l_partkey)  AS pk_hi
  FROM lineitem
), normed AS (
  SELECT l_orderkey, l_partkey,
         ((l_orderkey - ok_lo) * {_MAXV}) // greatest(ok_hi - ok_lo, 1) AS na,
         ((l_partkey  - pk_lo) * {_MAXV}) // greatest(pk_hi - pk_lo, 1) AS nb
  FROM lineitem CROSS JOIN stats
), coded AS (
  SELECT l_orderkey, l_partkey,
         CAST(({_duck_interleave("na", "nb")}) >> {2 * BITS - BUCKET_BITS}
              AS BIGINT) AS bucket
  FROM normed
)
SELECT bucket,
       count(*)        AS n_rows,
       min(l_orderkey) AS min_orderkey,
       max(l_orderkey) AS max_orderkey,
       min(l_partkey)  AS min_partkey,
       max(l_partkey)  AS max_partkey
FROM coded
GROUP BY bucket
ORDER BY bucket
"""


QUERIES = {"zorder_layout_stats": zorder_layout_stats}
ORACLES = {"zorder_layout_stats": ZORDER_SQL}
