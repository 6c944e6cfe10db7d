"""Fourth analytics batch: RANGE window frames (value-based, vs the
ROWS frames in window_frames), decimal-exact money aggregation (the
typed alternative to the integer-grid trick), and equi-depth ntile
bucketing (the quantile histogram next to histogram_part_prices'
equi-width one).

Reference parity: none of these exist in the reference (single
filter+sort query); SURVEY §2.4-§2.5 lists the aggregate/window
completeness target they extend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table


def range_frame_hourly_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour totals at every event via a RANGE frame
    over epoch seconds — value-based framing (all rows within 3600s),
    which ROWS frames cannot express when event spacing varies.

    Exactness: frame sums are on the cents grid (exact int64); the
    epoch-seconds order column is an exact integer; counts are longs.
    Scale: one shuffle on user_id, then a linear in-partition sweep —
    the RANGE frame is maintained incrementally by the window operator,
    not recomputed per row.
    """
    ev = load_table(spark, sf_dir, "events")
    staged = ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").cast("long").alias("epoch_s"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("qv"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        staged.select(
            "user_id",
            "event_id",
            "epoch_s",
            F.count("*").over(w).alias("n_1h"),
            (F.sum("qv").over(w) / F.lit(100.0)).alias("total_1h"),
        )
        .orderBy("user_id", "epoch_s", "event_id")
    )


RANGE_FRAME_SQL = """
WITH staged AS (
  SELECT user_id, event_id,
         -- floor, not CAST: epoch() carries the fractional second and
         -- BIGINT cast rounds, where Spark's timestamp->long truncates
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS qv
  FROM events
)
SELECT user_id, event_id, epoch_s,
       CAST(count(*) OVER fr AS BIGINT)       AS n_1h,
       CAST(sum(qv) OVER fr AS BIGINT) / 100.0 AS total_1h
FROM staged
WINDOW fr AS (PARTITION BY user_id ORDER BY epoch_s
              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
ORDER BY user_id, epoch_s, event_id
"""


def decimal_money_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money aggregation in DECIMAL(12,2) — the typed-exact alternative
    to the integer-grid trick used elsewhere: casting the double price
    onto a 2-decimal DECIMAL rounds identically in both engines (the
    stored double is within 1e-10 of the grid point), the DECIMAL sum
    is exact, and the single final cast to DOUBLE is correctly rounded
    in both. avg keeps DECIMAL division semantics (result scale 6,
    HALF_UP) — asserted equal to DuckDB's decimal division by emitting
    it as a string, which also pins the scale/formatting contract.

    Scale: one partial-agg shuffle on a 3-value key.
    """
    orders = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec).alias("total_dec"),
            F.avg(dec).alias("avg_dec"),
        )
        .select(
            "o_orderstatus",
            "n",
            F.col("total_dec").cast("double").alias("total_price"),
            F.col("avg_dec").cast("decimal(16,6)").cast("string").alias(
                "avg_price_str"
            ),
        )
        .orderBy("o_orderstatus")
    )


DECIMAL_MONEY_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
         AS total_price,
       CAST(CAST(avg(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(16,6))
            AS VARCHAR) AS avg_price_str
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


N_BUCKETS = 10


def equi_depth_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) bucketing of order prices via ntile: each
    bucket holds n/10 ±1 orders; emit each bucket's row count and
    [min, max] price span. The ORDER BY inside ntile carries a unique
    tiebreak (o_orderkey) so both engines assign identical buckets.

    Scale: ntile needs a single global order — fine for bucket-boundary
    ESTIMATION on a sample at 100 TB (or swap in approx quantiles);
    pinned exact here to stay oracle-checkable.
    """
    from trace_parquet_spark.operators.scale_hints import (
        warn_if_window_heavy,
    )

    orders = load_table(spark, sf_dir, "orders")
    # deliberate row-grain global ntile: the oracle ground truth whose
    # scale swap IS equi_depth_price_buckets_approx below — the hint
    # fires when the single sort partition crosses the cliff. The
    # footer row count (no Spark job) short-circuits the probe at
    # bench scale; the global window's size IS the table's row count.
    warn_if_window_heavy(
        "equi_depth_price_buckets",
        "equi_depth_price_buckets_approx",
        df=orders.select("o_orderkey"),
        keys=[],
        table_path=f"{sf_dir}/orders.parquet",
    )
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_totalprice", F.ntile(N_BUCKETS).over(w).alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .select(F.col("bucket").cast("long").alias("bucket"), "n_orders", "lo", "hi")
        .orderBy("bucket")
    )


EQUI_DEPTH_SQL = f"""
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi
FROM (
  SELECT o_totalprice,
         ntile({N_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
GROUP BY bucket
ORDER BY bucket
"""


EQ_CELLS = 256  # fixed histogram grid for the approx bucketing


def equi_depth_price_buckets_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of equi_depth_price_buckets: equi-depth buckets
    from a mergeable equi-width histogram instead of a global ntile
    sort. Prices land on the cent grid, are binned into EQ_CELLS fixed
    cells (one map-side-combinable agg — the same sketch shape as
    histogram_quantile_sketch), the cell→bucket boundary map is
    derived from cumulative cell mass, and rows get their bucket via a
    broadcast equi-join on cell id. No stage ever sees more than
    EQ_CELLS rows outside the two full scans; bucket sizes deviate
    from n/10 by at most one cell's mass. The cumulative sum runs as a
    broadcast theta self-join of the ≤EQ_CELLS-row histogram, so the
    plan carries NO single-partition exchange at any size (pinned in
    tests/test_scale_paths.py). The exact ntile version stays
    registered as this query's ground truth; integer-exact arithmetic
    keeps the DuckDB oracle hash-identical."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    bounds = orders.agg(
        F.min("cents").alias("mn"), F.max("cents").alias("mx")
    ).withColumn("width", F.expr(f"(mx - mn) div {EQ_CELLS} + 1"))
    celled = orders.crossJoin(F.broadcast(bounds)).select(
        "o_totalprice", F.expr("(cents - mn) div width").alias("cell")
    )
    hist = celled.groupBy("cell").agg(F.count("*").cast("long").alias("c"))
    h2 = hist.select(F.col("cell").alias("cell2"), F.col("c").alias("c2"))
    cum = (
        hist.join(F.broadcast(h2), F.col("cell2") <= F.col("cell"))
        .groupBy("cell")
        .agg(F.sum("c2").alias("cum_end"))
    )
    total = hist.agg(F.sum("c").alias("total"))
    cell_bucket = cum.crossJoin(F.broadcast(total)).select(
        "cell",
        (F.expr(f"((cum_end - 1) * {N_BUCKETS}) div total") + 1)
        .cast("long")
        .alias("bucket"),
    )
    return (
        celled.join(F.broadcast(cell_bucket), "cell")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .select("bucket", "n_orders", "lo", "hi")
        .orderBy("bucket")
    )


EQUI_DEPTH_APPROX_SQL = f"""
WITH o AS (
  SELECT o_totalprice,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
bounds AS (
  SELECT min(cents) AS mn,
         (max(cents) - min(cents)) // {EQ_CELLS} + 1 AS width
  FROM o
),
celled AS (
  SELECT o_totalprice, (cents - b.mn) // b.width AS cell
  FROM o, bounds b
),
hist AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS c FROM celled GROUP BY cell
),
cum AS (
  SELECT h.cell, CAST(sum(h2.c) AS BIGINT) AS cum_end
  FROM hist h JOIN hist h2 ON h2.cell <= h.cell
  GROUP BY h.cell
),
total AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM hist),
cell_bucket AS (
  SELECT cell,
         CAST(((cum_end - 1) * {N_BUCKETS}) // total + 1 AS BIGINT) AS bucket
  FROM cum, total
)
SELECT b.bucket, CAST(count(*) AS BIGINT) AS n_orders,
       min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM celled x JOIN cell_bucket b ON x.cell = b.cell
GROUP BY b.bucket
ORDER BY b.bucket
"""


TREND_TOP = 2


def trending_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending detection: top event types per sliding window (6h wide,
    3h slide) — F.window's multi-assignment + a per-window rank. The
    DuckDB oracle expands the two overlapping windows per event
    explicitly (the same idiom as sliding_window_events).

    Scale: the window() explode is ×2 rows, then one partial-agg
    shuffle on (window, type); the rank runs over 5-type groups.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    wrank = Window.partitionBy("window_start").orderBy(
        F.desc("n"), "event_type"
    )
    return (
        counts.withColumn("rank", F.row_number().over(wrank).cast("long"))
        .filter(F.col("rank") <= TREND_TOP)
        .orderBy("window_start", "rank")
    )


TRENDING_SQL = f"""
WITH hits AS (
  SELECT time_bucket(INTERVAL '3 hours', CAST(ts AS TIMESTAMP)) AS window_start,
         event_type
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '3 hours', CAST(ts AS TIMESTAMP))
           - INTERVAL '3 hours',
         event_type
  FROM events
), counts AS (
  SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n
  FROM hits GROUP BY window_start, event_type
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY window_start
                               ORDER BY n DESC, event_type) AS rank
  FROM counts
)
SELECT window_start, event_type, n, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TREND_TOP}
ORDER BY window_start, rank
"""


def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per order priority: yearly grid
    sums (exact ints) + lag, growth as one exact-int double division.

    Scale: one partial-agg shuffle to (year × priority) grain; the lag
    window runs over ~7 rows per priority.
    """
    orders = load_table(spark, sf_dir, "orders")
    yearly = (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"), "o_orderpriority"
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("rev_q")
        )
    )
    wlag = Window.partitionBy("o_orderpriority").orderBy("yr")
    prev = F.lag("rev_q").over(wlag)
    return yearly.select(
        "yr",
        "o_orderpriority",
        (F.col("rev_q") / F.lit(100.0)).alias("revenue"),
        ((F.col("rev_q") - prev) / prev).alias("yoy_growth"),
    ).orderBy("o_orderpriority", "yr")


YOY_SQL = """
WITH yearly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         o_orderpriority,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_q
  FROM orders
  GROUP BY 1, 2
)
SELECT yr, o_orderpriority,
       rev_q / 100.0 AS revenue,
       CAST(rev_q - lag(rev_q) OVER w AS DOUBLE)
         / lag(rev_q) OVER w AS yoy_growth
FROM yearly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY yr)
ORDER BY o_orderpriority, yr
"""


QUERIES = {
    "range_frame_hourly_totals": range_frame_hourly_totals,
    "decimal_money_totals": decimal_money_totals,
    "equi_depth_price_buckets": equi_depth_price_buckets,
    "equi_depth_price_buckets_approx": equi_depth_price_buckets_approx,
    "trending_event_types": trending_event_types,
    "yoy_revenue_growth": yoy_revenue_growth,
}

ORACLES = {
    "range_frame_hourly_totals": RANGE_FRAME_SQL,
    "decimal_money_totals": DECIMAL_MONEY_SQL,
    "equi_depth_price_buckets": EQUI_DEPTH_SQL,
    "equi_depth_price_buckets_approx": EQUI_DEPTH_APPROX_SQL,
    "trending_event_types": TRENDING_SQL,
    "yoy_revenue_growth": YOY_SQL,
}
