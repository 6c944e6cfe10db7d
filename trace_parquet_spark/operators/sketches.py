"""Mergeable sketches with an EXPLICIT, cross-engine-exact hash family.

The reference keeps every aggregate exact (its whole result set fits in
one service heap — reference service/ParquetConversionService.java:53-61
buffers the full list); at 100 TB the engine additionally needs
*sketchable* aggregates whose partial states are small, mergeable, and
cheap to combine map-side. Spark's built-ins (approx_count_distinct,
count_min_sketch) are implementations of exactly these sketches, but
their hash seeds are engine-private, so a cross-engine gate can only
check them rows-only. This module builds the three canonical sketches
over the md5 family from functions/hashing.py instead — every register,
bucket and estimate is bit-identical in Spark and DuckDB, so the
driver's value-hash gate applies to the *sketch contents*, not just row
counts:

- **Count-Min** (``cms_user_event_counts``): depth×width count matrix;
  a sketch is one ``groupBy`` whose map-side partial aggregation IS the
  sketch merge (sketches add). Point estimates are min over depth rows,
  never under the true count.
- **KMV / bottom-k** (``kmv_distinct_sketch``): the k smallest distinct
  hash values per group; merge = k smallest of the union. Estimate
  (k-1)·2^32 / h_(k) in pure integer arithmetic.
- **HyperLogLog with explicit registers** (``hll_register_estimate``):
  m=64 max-rank registers (merge = element-wise max); the harmonic sum
  is kept as the exact integer Σ 2^(27-M_j), and the estimate is scaled
  to an integer via a single truncating division, so no float crosses
  the engine boundary at all.

Scale notes: sketch state is O(depth·width) / O(k) / O(m) per group —
constant-size partials that combine associatively, which is precisely
what survives a 1000-executor tree aggregation. The estimate joins are
against the tiny sketch relation and broadcast. Merge associativity
(half-corpus partials combine to the whole-corpus sketch) is pinned by
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import (
    stable_hash32,
    stable_hash32_sql,
    stable_hash32_x4,
    stable_hash32_x4_sql,
)
from ..sources.registry import load_table

CMS_DEPTH = 4
CMS_WIDTH = 32  # 150 keys into 32 buckets: real collisions, real overcounts
CMS_SEED = 7

KMV_K = 16
HLL_M = 64  # 2^6 registers; w carries the remaining 26 bits
# est = alpha_64 * m^2 / S with alpha_64 = 709/1000, S = S_scaled / 2^27.
# est_x1000 = (709 * 64^2 * 2^27) div S_scaled  — pure integer.
_HLL_NUM = 709 * HLL_M * HLL_M * (1 << 27)


def _cms_pairs(h: list, width: int) -> F.Column:
    """(row j, bucket) pairs for one key's CMS coordinates, explodable."""
    return F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("j"),
                F.pmod(h[j], F.lit(width)).cast("long").alias("bucket"),
            )
            for j in range(CMS_DEPTH)
        ]
    )


def cms_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point estimates of per-user event counts next to the
    exact counts. The sketch is a single groupBy over (row, bucket) —
    its map-side combine is the sketch merge; the estimate pass joins
    the 150 distinct keys against the ≤128-row sketch (broadcast)."""
    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id").cast("string")
    h = stable_hash32_x4(key, CMS_SEED)

    sketch = (
        ev.select(F.explode(_cms_pairs(h, CMS_WIDTH)).alias("jb"))
        .select("jb.j", "jb.bucket")
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
    exact = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("n_exact"))
    kh = stable_hash32_x4(F.col("user_id").cast("string"), CMS_SEED)
    lookups = exact.select(
        "user_id", "n_exact", F.explode(_cms_pairs(kh, CMS_WIDTH)).alias("jb")
    ).select("user_id", "n_exact", "jb.j", "jb.bucket")
    return (
        lookups.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("c").cast("long").alias("cms_est"))
        .select(
            "user_id",
            "n_exact",
            "cms_est",
            (F.col("cms_est") - F.col("n_exact")).cast("long").alias("overcount"),
        )
        .orderBy("user_id")
    )


def _cms_sql_parts() -> tuple[str, str]:
    hs = stable_hash32_x4_sql("CAST(user_id AS VARCHAR)", CMS_SEED)
    pairs = "\n  UNION ALL ".join(
        f"SELECT user_id, {j} AS j, ({hs[j]}) % {CMS_WIDTH} AS bucket FROM events"
        for j in range(CMS_DEPTH)
    )
    return pairs, hs[0]


CMS_SQL = f"""
WITH coords AS (
  {_cms_sql_parts()[0]}
),
sketch AS (
  SELECT j, bucket, CAST(count(*) AS BIGINT) AS c
  FROM coords GROUP BY j, bucket
),
exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact
  FROM events GROUP BY user_id
),
est AS (
  SELECT co.user_id, min(s.c) AS cms_est
  FROM (SELECT DISTINCT user_id, j, bucket FROM coords) co
  JOIN sketch s ON co.j = s.j AND co.bucket = s.bucket
  GROUP BY co.user_id
)
SELECT e.user_id, e.n_exact, CAST(est.cms_est AS BIGINT) AS cms_est,
       CAST(est.cms_est - e.n_exact AS BIGINT) AS overcount
FROM exact e JOIN est ON e.user_id = est.user_id
ORDER BY e.user_id
"""


def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) distinct-user estimate per event type. The type is
    folded into the hashed key so each group sees an independent sample
    of hash space. All-integer estimate: (k-1)·2^32 div h_(k); when a
    group holds fewer than k distinct keys the sketch is exact."""
    ev = load_table(spark, sf_dir, "events")
    h = stable_hash32(
        F.concat(F.col("event_type"), F.lit(":"), F.col("user_id").cast("string"))
    )
    hashes = ev.select("event_type", h.alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    bottom = (
        hashes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_seen"),
            F.max("h").alias("h_k"),
        )
    )
    exact = hashes.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    est = F.when(
        F.col("n_seen") < KMV_K, F.col("n_seen")
    ).otherwise(F.expr(f"{KMV_K - 1} * 4294967296 div h_k"))
    return (
        bottom.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            est.cast("long").alias("kmv_est"),
            F.abs(est - F.col("n_exact")).cast("long").alias("abs_err"),
        )
        .orderBy("event_type")
    )


KMV_SQL = f"""
WITH hashes AS (
  SELECT DISTINCT event_type,
         {stable_hash32_sql("event_type || ':' || CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashes
),
bottom AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_seen, max(h) AS h_k
  FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
  FROM hashes GROUP BY event_type
),
est AS (
  SELECT b.event_type, e.n_exact,
         CASE WHEN b.n_seen < {KMV_K} THEN b.n_seen
              ELSE {KMV_K - 1} * 4294967296 // b.h_k END AS kmv_est
  FROM bottom b JOIN exact e ON b.event_type = e.event_type
)
SELECT event_type, n_exact, CAST(kmv_est AS BIGINT) AS kmv_est,
       CAST(abs(kmv_est - n_exact) AS BIGINT) AS abs_err
FROM est
ORDER BY event_type
"""


def hll_register_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog over explicit registers, per event type: idx = h mod
    64, rank = leading-zeros(h div 64 as 26-bit) + 1, register = max
    rank. The harmonic sum is materialized as the exact integer
    S = Σ 2^(27-M_j) (empty registers contribute 2^27), and the raw HLL
    estimate is the integer (709·m²·2^27) div S, scaled ×1000 — no
    floating point anywhere, so the gate compares exact sketch state."""
    ev = load_table(spark, sf_dir, "events")
    h = stable_hash32(
        F.concat(F.col("event_type"), F.lit("#"), F.col("user_id").cast("string"))
    )
    hashed = ev.select("event_type", h.alias("h")).distinct()
    regs = (
        hashed.select(
            "event_type",
            F.pmod("h", F.lit(HLL_M)).alias("idx"),
            F.expr(f"h div {HLL_M}").alias("w"),
        )
        .select(
            "event_type",
            "idx",
            F.when(F.col("w") == 0, F.lit(27))
            .otherwise(F.lit(27) - F.length(F.bin("w")))
            .alias("rank"),
        )
        .groupBy("event_type", "idx")
        .agg(F.max("rank").alias("m_j"))
    )
    per_type = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(1L, cast(27 - m_j as int))")).alias("s_present"),
        F.count("*").cast("long").alias("n_regs"),
    )
    exact = hashed.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    return (
        per_type.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            (F.lit(HLL_M) - F.col("n_regs")).cast("long").alias("n_zero_registers"),
            F.expr(
                f"{_HLL_NUM} div (s_present + ({HLL_M} - n_regs) * {1 << 27})"
            )
            .cast("long")
            .alias("hll_est_x1000"),
        )
        .orderBy("event_type")
    )


HLL_SQL = f"""
WITH hashes AS (
  SELECT DISTINCT event_type,
         {stable_hash32_sql("event_type || '#' || CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
regs AS (
  SELECT event_type, h % {HLL_M} AS idx,
         max(CASE WHEN h // {HLL_M} = 0 THEN 27
                  ELSE 27 - length(printf('%b', h // {HLL_M})) END) AS m_j
  FROM hashes GROUP BY event_type, idx
),
per_type AS (
  SELECT event_type,
         CAST(sum(CAST(1 AS BIGINT) << (27 - m_j)) AS BIGINT) AS s_present,
         CAST(count(*) AS BIGINT) AS n_regs
  FROM regs GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
  FROM hashes GROUP BY event_type
)
SELECT p.event_type, e.n_exact,
       CAST({HLL_M} - p.n_regs AS BIGINT) AS n_zero_registers,
       CAST({_HLL_NUM} // (p.s_present + ({HLL_M} - p.n_regs) * {1 << 27})
            AS BIGINT) AS hll_est_x1000
FROM per_type p JOIN exact e ON p.event_type = e.event_type
ORDER BY p.event_type
"""


HIST_BINS = 64
HIST_PS = (50, 95, 99)


def histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram as a quantile sketch: global
    [min, max] cent bounds, 64 fixed bins, per-group bin counts (the
    sketch — partials add, like CMS rows), then p50/p95/p99 estimated
    by integer interpolation inside the crossing bin and compared to
    the true rank statistic. target rank is ceil(n·p/100); the
    estimate is bin_lo + (pos-1)·width div bin_count — every step a
    truncating integer op, so both engines agree to the cent.

    Scale: one pass for bounds (min/max combine trivially), one pass
    for the histogram (map-side partial agg onto ≤ groups×64 cells),
    and the quantile extraction runs on the tiny histogram relation.
    The exact rank statistic here is the verification column; at real
    scale only the sketch side runs."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    bounds = li.agg(
        F.min("cents").alias("mn"), F.max("cents").alias("mx")
    ).withColumn("width", F.expr(f"(mx - mn) div {HIST_BINS} + 1"))
    binned = li.crossJoin(F.broadcast(bounds)).select(
        "l_returnflag",
        "cents",
        "mn",
        "width",
        F.expr("(cents - mn) div width").alias("bin"),
    )
    hist = binned.groupBy("l_returnflag", "mn", "width", "bin").agg(
        F.count("*").cast("long").alias("c")
    )
    wb = Window.partitionBy("l_returnflag").orderBy("bin")
    cum = hist.select(
        "l_returnflag",
        "mn",
        "width",
        "bin",
        "c",
        F.sum("c").over(wb).cast("long").alias("cum"),
        F.sum("c")
        .over(Window.partitionBy("l_returnflag"))
        .cast("long")
        .alias("n"),
    )
    targets = cum.select(
        "*",
        F.explode(F.array(*[F.lit(p) for p in HIST_PS])).alias("p"),
    ).withColumn("target", F.expr("(n * p + 99) div 100"))
    crossing = (
        targets.where(F.col("cum") >= F.col("target"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("l_returnflag", "p").orderBy("bin")
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            "p",
            F.expr(
                "mn + bin * width"
                " + ((target - (cum - c) - 1) * width) div c"
            )
            .cast("long")
            .alias("est_cents"),
            "target",
        )
    )
    wr = Window.partitionBy("l_returnflag").orderBy("cents")
    exact = (
        binned.select("l_returnflag", "cents")
        .withColumn("rnk", F.row_number().over(wr))
        .withColumnRenamed("l_returnflag", "flag2")
    )
    return (
        crossing.join(
            exact,
            (F.col("l_returnflag") == F.col("flag2"))
            & (F.col("rnk") == F.col("target")),
        )
        .select(
            "l_returnflag",
            F.col("p").cast("long").alias("p"),
            "est_cents",
            F.col("cents").alias("exact_cents"),
            (F.col("est_cents") - F.col("cents")).cast("long").alias("err_cents"),
        )
        .orderBy("l_returnflag", "p")
    )


HIST_SQL = f"""
WITH li AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
),
bounds AS (
  SELECT min(cents) AS mn, max(cents) AS mx,
         (max(cents) - min(cents)) // {HIST_BINS} + 1 AS width
  FROM li
),
binned AS (
  SELECT l_returnflag, cents, b.mn, b.width,
         (cents - b.mn) // b.width AS bin
  FROM li, bounds b
),
hist AS (
  SELECT l_returnflag, mn, width, bin, CAST(count(*) AS BIGINT) AS c
  FROM binned GROUP BY l_returnflag, mn, width, bin
),
cum AS (
  SELECT *,
         CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY bin) AS BIGINT)
           AS cumc,
         CAST(sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
  FROM hist
),
targets AS (
  SELECT *, (n * p + 99) // 100 AS target
  FROM cum, (SELECT unnest([{", ".join(str(p) for p in HIST_PS)}]) AS p)
),
crossing AS (
  SELECT l_returnflag, p,
         CAST(mn + bin * width
              + ((target - (cumc - c) - 1) * width) // c AS BIGINT)
           AS est_cents,
         target
  FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag, p
                                     ORDER BY bin) AS rn
        FROM targets WHERE cumc >= target)
  WHERE rn = 1
),
exact AS (
  SELECT l_returnflag AS flag2, cents,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rnk
  FROM binned
)
SELECT c.l_returnflag, CAST(c.p AS BIGINT) AS p, c.est_cents,
       e.cents AS exact_cents,
       CAST(c.est_cents - e.cents AS BIGINT) AS err_cents
FROM crossing c JOIN exact e ON c.l_returnflag = e.flag2 AND e.rnk = c.target
ORDER BY c.l_returnflag, c.p
"""


QUERIES = {
    "cms_user_event_counts": cms_user_event_counts,
    "kmv_distinct_sketch": kmv_distinct_sketch,
    "hll_register_estimate": hll_register_estimate,
    "histogram_quantile_sketch": histogram_quantile_sketch,
}

ORACLES = {
    "cms_user_event_counts": CMS_SQL,
    "kmv_distinct_sketch": KMV_SQL,
    "hll_register_estimate": HLL_SQL,
    "histogram_quantile_sketch": HIST_SQL,
}


# --------------------------------------------------------------------------
# KMV set operations: segment-overlap estimation from mergeable samples
# --------------------------------------------------------------------------

KMV_OV_K = 64  # larger k than the per-group sketch: overlap needs resolution


def kmv_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation between event-type segments from
    KMV sketches — the SET-OPERATION face of bottom-k sketching: the
    per-group sketch answers |A|; this answers |A∩B| and J(A,B)
    WITHOUT an exact distinct-intersection pass. The mechanism (Beyer
    et al., SIGMOD 2007): hash users SEGMENT-INDEPENDENTLY (the same
    user must collide across segments — the opposite of the folded
    per-group hash), keep each segment's k smallest; for a pair, the
    k smallest of the sample UNION are a uniform sample of A∪B, so
    ρ = |{v in that sample seen in both A's and B's sketches}|
    estimates J·k, and |A∩B| ≈ ρ/k · (k−1)·2³²/θ with θ the kth
    union value. When the union sample holds < k values the sketch IS
    the union and every estimate is exact.

    All-integer discipline: Jaccard on the ppm grid
    (ρ·10⁶ div n_kept), intersection as one fused integer expression
    (ρ·(k−1)·2³² div (θ·k)) — no floats anywhere, so the sketch
    contents AND estimates hash-match the oracle bit-for-bit. The
    exact intersection/Jaccard ride along as in-row evidence columns.

    Scale: sketches are k rows per segment (mergeable — map-side
    combine builds them distributively); pair estimation touches only
    sketch rows (segments² · k), never the user universe again."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("event_type", "user_id").distinct()
    h = stable_hash32(F.concat(F.lit("kmvo:"), F.col("user_id").cast("string")))
    hashed = users.select("event_type", h.alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    sample = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_OV_K)
        .select(F.col("event_type").alias("seg"), "h")
    )
    segs = sample.select("seg").distinct()
    pairs = (
        segs.select(F.col("seg").alias("seg_a"))
        .crossJoin(segs.select(F.col("seg").alias("seg_b")))
        .where(F.col("seg_a") < F.col("seg_b"))
    )
    cand = pairs.join(
        F.broadcast(sample),
        (F.col("seg") == F.col("seg_a")) | (F.col("seg") == F.col("seg_b")),
    )
    merged = cand.groupBy("seg_a", "seg_b", "h").agg(
        F.max((F.col("seg") == F.col("seg_a")).cast("int")).alias("in_a"),
        F.max((F.col("seg") == F.col("seg_b")).cast("int")).alias("in_b"),
    )
    wp = Window.partitionBy("seg_a", "seg_b").orderBy("h")
    kept = merged.withColumn("rn", F.row_number().over(wp)).where(
        F.col("rn") <= KMV_OV_K
    )
    est = kept.groupBy("seg_a", "seg_b").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("h").alias("theta"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("rho"),
    )
    exact = (
        users.alias("x")
        .join(
            users.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("seg_a"),
            F.col("y.event_type").alias("seg_b"),
        )
        .agg(F.count("*").cast("long").alias("exact_inter"))
    )
    sizes = users.groupBy(F.col("event_type").alias("seg")).agg(
        F.count("*").cast("long").alias("n_users")
    )
    out = (
        est.join(exact, ["seg_a", "seg_b"], "left")
        .join(
            F.broadcast(sizes.select(F.col("seg").alias("seg_a"), F.col("n_users").alias("na"))),
            "seg_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("seg").alias("seg_b"), F.col("n_users").alias("nb"))),
            "seg_b",
        )
        .select(
            "seg_a",
            "seg_b",
            "n_kept",
            "rho",
            F.expr(f"CAST(rho * 1000000 DIV n_kept AS BIGINT)").alias(
                "jaccard_est_ppm"
            ),
            F.when(F.col("n_kept") < KMV_OV_K, F.col("rho"))
            .otherwise(
                F.expr(
                    f"CAST(rho * {KMV_OV_K - 1} * 4294967296"
                    f" DIV (theta * {KMV_OV_K}) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("inter_est"),
            F.coalesce(F.col("exact_inter"), F.lit(0))
            .cast("long")
            .alias("exact_inter"),
            F.expr(
                "CAST(coalesce(exact_inter, 0) * 1000000"
                " DIV (na + nb - coalesce(exact_inter, 0)) AS BIGINT)"
            ).alias("exact_jaccard_ppm"),
        )
        .orderBy("seg_a", "seg_b")
    )
    return out


_KMVO_H = stable_hash32_sql("'kmvo:' || CAST(user_id AS VARCHAR)")

KMV_OVERLAP_SQL = f"""
WITH users AS (
  SELECT DISTINCT event_type, user_id FROM events
), hashed AS (
  SELECT DISTINCT event_type, {_KMVO_H} AS h FROM users
), sample AS (
  SELECT event_type AS seg, h
  FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {KMV_OV_K}
), segs AS (SELECT DISTINCT seg FROM sample),
pairs AS (
  SELECT a.seg AS seg_a, b.seg AS seg_b
  FROM segs a JOIN segs b ON a.seg < b.seg
), merged AS (
  SELECT p.seg_a, p.seg_b, s.h,
         max(CASE WHEN s.seg = p.seg_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.seg = p.seg_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sample s ON s.seg IN (p.seg_a, p.seg_b)
  GROUP BY 1, 2, 3
), kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY seg_a, seg_b ORDER BY h) AS rn
    FROM merged
  ) WHERE rn <= {KMV_OV_K}
), est AS (
  SELECT seg_a, seg_b,
         CAST(count(*) AS BIGINT) AS n_kept,
         max(h) AS theta,
         CAST(sum(in_a * in_b) AS BIGINT) AS rho
  FROM kept GROUP BY 1, 2
), exact AS (
  SELECT x.event_type AS seg_a, y.event_type AS seg_b,
         CAST(count(*) AS BIGINT) AS exact_inter
  FROM users x JOIN users y
    ON x.user_id = y.user_id AND x.event_type < y.event_type
  GROUP BY 1, 2
), sizes AS (
  SELECT event_type AS seg, CAST(count(*) AS BIGINT) AS n_users
  FROM users GROUP BY 1
)
SELECT e.seg_a, e.seg_b, e.n_kept, e.rho,
       CAST(e.rho * 1000000 // e.n_kept AS BIGINT) AS jaccard_est_ppm,
       CAST(CASE WHEN e.n_kept < {KMV_OV_K} THEN e.rho
                 ELSE e.rho * {KMV_OV_K - 1} * 4294967296
                      // (e.theta * {KMV_OV_K}) END AS BIGINT) AS inter_est,
       CAST(coalesce(x.exact_inter, 0) AS BIGINT) AS exact_inter,
       CAST(coalesce(x.exact_inter, 0) * 1000000
            // (sa.n_users + sb.n_users - coalesce(x.exact_inter, 0))
            AS BIGINT) AS exact_jaccard_ppm
FROM est e
LEFT JOIN exact x ON e.seg_a = x.seg_a AND e.seg_b = x.seg_b
JOIN sizes sa ON e.seg_a = sa.seg
JOIN sizes sb ON e.seg_b = sb.seg
ORDER BY e.seg_a, e.seg_b
"""

QUERIES["kmv_segment_overlap"] = kmv_segment_overlap
ORACLES["kmv_segment_overlap"] = KMV_OVERLAP_SQL


# ---------------------------------------------------------------------------
# CMS inner product: sketch-based equi-join size estimation
# ---------------------------------------------------------------------------


def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join size estimation from two Count-Min sketches — the
    AGMS/CMS inner-product identity: |A ⋈_k B| = Σ_k cntA(k)·cntB(k)
    is estimated by min_j Σ_bucket A_j[b]·B_j[b], never touching the
    join itself. join_size_estimates computes the exact pre-flight
    number by shuffling both key sets; this is the sketch path a
    100 TB optimizer uses when even the key-grain aggregates are too
    big to move — two CMS builds (map-side combined, ≤ depth×width
    rows each) and a constant-size inner product.

    One row per depth with its inner product, the estimate (min over
    depths, always an overcount in expectation), the exact size, and
    the signed error in ppm — all exact integers from the shared md5
    family. Orders-side key: o_custkey; customer side: c_custkey
    (so the estimate targets the orders⋈customer join)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def sketch_of(df: DataFrame, col: str):
        h = stable_hash32_x4(F.col(col).cast("string"), CMS_SEED)
        return (
            df.select(F.explode(_cms_pairs(h, CMS_WIDTH)).alias("jb"))
            .select("jb.j", "jb.bucket")
            .groupBy("j", "bucket")
            .agg(F.count("*").cast("long").alias("c"))
        )
    sa = sketch_of(orders, "o_custkey")
    sb = sketch_of(cust, "c_custkey")
    inner = (
        sa.alias("a")
        .join(F.broadcast(sb.alias("b")), ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("ip"))
    )
    exact = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("ca"))
        .join(
            cust.groupBy("c_custkey").agg(F.count("*").alias("cb")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long"))
        .collect()[0][0]
        or 0
    )
    # global window is sketch-depth bounded: |inner| = CMS depth rows
    w = Window.orderBy(F.lit(1))
    return (
        inner.withColumn("est", F.min("ip").over(w))
        .select(
            "j",
            "ip",
            F.col("est").cast("long").alias("cms_join_est"),
            F.lit(exact).cast("long").alias("exact_join_size"),
            F.expr(
                f"CAST((est - {exact}) * 1000000 DIV {max(exact, 1)} AS BIGINT)"
            ).alias("err_ppm"),
        )
        .orderBy("j")
    )


def _cms_join_sql() -> str:
    ha = stable_hash32_x4_sql("CAST(o_custkey AS VARCHAR)", CMS_SEED)
    hb = stable_hash32_x4_sql("CAST(c_custkey AS VARCHAR)", CMS_SEED)
    pa = "\n  UNION ALL ".join(
        f"SELECT CAST({j} AS BIGINT) AS j, CAST({ha[j]} % {CMS_WIDTH} AS BIGINT)"
        f" AS bucket FROM orders"
        for j in range(CMS_DEPTH)
    )
    pb = "\n  UNION ALL ".join(
        f"SELECT CAST({j} AS BIGINT) AS j, CAST({hb[j]} % {CMS_WIDTH} AS BIGINT)"
        f" AS bucket FROM customer"
        for j in range(CMS_DEPTH)
    )
    return f"""
WITH pa AS (
  {pa}
), pb AS (
  {pb}
), sa AS (
  SELECT j, bucket, CAST(count(*) AS BIGINT) AS c FROM pa GROUP BY j, bucket
), sb AS (
  SELECT j, bucket, CAST(count(*) AS BIGINT) AS c FROM pb GROUP BY j, bucket
), inner_p AS (
  SELECT sa.j, CAST(sum(sa.c * sb.c) AS BIGINT) AS ip
  FROM sa JOIN sb ON sa.j = sb.j AND sa.bucket = sb.bucket
  GROUP BY sa.j
), exact AS (
  SELECT CAST(coalesce(sum(ca.n * cb.n), 0) AS BIGINT) AS x
  FROM (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY 1) ca
  JOIN (SELECT c_custkey AS k, count(*) AS n FROM customer GROUP BY 1) cb
    ON ca.k = cb.k
)
SELECT j, ip,
       CAST(min(ip) OVER () AS BIGINT) AS cms_join_est,
       (SELECT x FROM exact) AS exact_join_size,
       CAST((min(ip) OVER () - (SELECT x FROM exact)) * 1000000
            // greatest((SELECT x FROM exact), 1) AS BIGINT) AS err_ppm
FROM inner_p
ORDER BY j
"""


QUERIES["cms_join_size_estimate"] = cms_join_size_estimate
ORACLES["cms_join_size_estimate"] = _cms_join_sql()
