"""Statistical analytics with bit-exact cross-engine results: group
moments (variance / stddev / correlation), rolling-window anomaly
detection, and ratio-to-report shares.

The reference engine computes no statistics at all (one filter+sort
query — repository/ParameterDataRepository.java:53-78); SURVEY §2.4-§2.5 lists
the aggregate/window surface these extend.

Why not stddev_samp/corr built-ins on both engines: those sum doubles
in engine- and partition-order, so the last ulp differs run-to-run and
engine-to-engine. Instead every moment is computed from EXACT integer
power sums (n, Σx, Σx², Σxy on the value's decimal grid — quantities
are integral, money is on the 1e-2 grid), carried as BIGINT/DECIMAL(38)
so they cannot overflow or round, and the final statistic is ONE
identical chain of double ops on those exact integers — IEEE 754 then
guarantees both engines produce the same bits. The same trick makes the
anomaly detector float-free: |x−μ| > 3σ over a frame of w rows is
algebraically (w·x − Σx)² > 9·(w·Σx² − (Σx)²), evaluated entirely in
int64.

Scale notes per query below; all three are single-shuffle shapes
(partial aggregation or a window over the natural partition key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import _REVENUE


def group_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / variance / stddev of extended price and the
    quantity↔price correlation per return flag, from exact power sums.

    Scale: one partial-agg shuffle on a 3-value key; the six power sums
    are map-side combined, so the exchange carries 3 rows per task no
    matter the input size. Σ(qy²) exceeds int64 beyond ~sf0.05, so the
    squared-money sums ride in DECIMAL(38,0) (exact to 1e38; DuckDB's
    HUGEINT mirrors it).
    """
    li = load_table(spark, sf_dir, "lineitem")
    qx = F.col("l_quantity").cast("long")
    qy = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    dec = "decimal(38,0)"
    g = (
        li.select(qx.alias("qx"), qy.alias("qy"), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("qx").alias("sx"),
            F.sum("qy").alias("sy"),
            F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
            F.sum((F.col("qy").cast(dec) * F.col("qy"))).alias("syy"),
            F.sum(F.col("qx") * F.col("qy")).alias("sxy"),
        )
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # exact integers → double in one step, then one fixed op chain.
    # Every product is widened to DECIMAL(38,0) first: n·Σxy and Σx·Σy
    # pass 2^63 somewhere around sf0.1 (DuckDB's HUGEINT mirrors this).
    var_num = (n.cast(dec) * syy - sy.cast(dec) * sy).cast("double")
    cov_num = (n.cast(dec) * sxy - sx.cast(dec) * sy).cast("double")
    varx_num = (n.cast(dec) * sxx - sx.cast(dec) * sx).cast("double")
    nn = (n * n).cast("double")
    return g.select(
        "l_returnflag",
        n,
        (sx / n).alias("mean_qty"),
        (sy / n / F.lit(100.0)).alias("mean_price"),
        (var_num / nn / F.lit(1e4)).alias("var_price"),
        F.sqrt(var_num / nn / F.lit(1e4)).alias("stddev_price"),
        (cov_num / (F.sqrt(varx_num) * F.sqrt(var_num))).alias(
            "corr_qty_price"
        ),
    ).orderBy("l_returnflag")


GROUP_MOMENTS_SQL = """
WITH sums AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT)                          AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)   AS sx,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT)                                   AS sy,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT)                                   AS sxx,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS syy,
         CAST(sum(CAST(l_quantity AS BIGINT)
             * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT)                                   AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       CAST(sx AS DOUBLE) / n                              AS mean_qty,
       CAST(sy AS DOUBLE) / n / 100.0                      AS mean_price,
       CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
         / CAST(n * n AS DOUBLE) / 1e4                     AS var_price,
       sqrt(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
            / CAST(n * n AS DOUBLE) / 1e4)                 AS stddev_price,
       CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / (sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
            * sqrt(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
                                                           AS corr_qty_price
FROM sums
ORDER BY l_returnflag
"""


ANOMALY_LOOKBACK = 20  # rolling frame: the previous N events
ANOMALY_MIN_N = 10  # need at least this many in-frame to flag
ANOMALY_K = 3  # flag at |x − μ| > K·σ


def rolling_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling-window outlier detection, float-free.

    For each event, the frame is the user's previous 20 events; the
    event is anomalous when |x − μ_frame| > 3·σ_frame. Cleared of
    division entirely: with w rows, Σx, Σx² in the frame, the test is
    (w·x − Σx)² > K²·(w·Σx² − (Σx)²) — all int64 on the cents grid
    (frame sums are ≤ 20·49002² ≈ 5e10, far inside int64).

    Scale: one shuffle on user_id, then a linear per-partition window
    pass; state per key is the 20-row frame. Emits only anomalies, so
    output is tiny relative to input.
    """
    ev = load_table(spark, sf_dir, "events")
    qv = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOMALY_LOOKBACK, -1)
    )
    staged = ev.select(
        "user_id", "event_id", "ts", "value", qv.alias("qv")
    ).select(
        "*",
        F.count("qv").over(w).alias("w"),
        F.sum("qv").over(w).alias("sw"),
        F.sum(F.col("qv") * F.col("qv")).over(w).alias("sww"),
    )
    dev = F.col("w") * F.col("qv") - F.col("sw")
    spread = F.col("w") * F.col("sww") - F.col("sw") * F.col("sw")
    return (
        staged.filter(
            (F.col("w") >= ANOMALY_MIN_N)
            & (dev * dev > F.lit(ANOMALY_K * ANOMALY_K) * spread)
        )
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.col("w").alias("frame_n"),
            # exact ints → one double division each: bit-identical
            (F.col("sw") / F.col("w") / F.lit(100.0)).alias("frame_mean"),
            (dev * dev).alias("dev2_q"),
            (F.lit(ANOMALY_K * ANOMALY_K) * spread).alias("thr_q"),
        )
        .orderBy("user_id", "event_id")
    )


ROLLING_ANOMALY_SQL = f"""
WITH staged AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS qv
  FROM events
), framed AS (
  SELECT *,
         CAST(count(qv) OVER fr AS BIGINT) AS w,
         CAST(sum(qv)  OVER fr AS BIGINT) AS sw,
         CAST(sum(qv * qv) OVER fr AS BIGINT) AS sww
  FROM staged
  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN {ANOMALY_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, ts, value,
       w                                        AS frame_n,
       CAST(sw AS DOUBLE) / w / 100.0           AS frame_mean,
       (w * qv - sw) * (w * qv - sw)            AS dev2_q,
       {ANOMALY_K * ANOMALY_K} * (w * sww - sw * sw) AS thr_q
FROM framed
WHERE w >= {ANOMALY_MIN_N}
  AND (w * qv - sw) * (w * qv - sw) > {ANOMALY_K * ANOMALY_K} * (w * sww - sw * sw)
ORDER BY user_id, event_id
"""


def revenue_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each supplier nation's revenue share within its
    region. Revenue is grid-summed to an exact integer per nation; the
    share is one long/long → double division (identical both engines).

    Scale: lineitem collapses to per-nation grain in ONE partial-agg
    shuffle (supplier/nation/region broadcast); the region-total window
    then runs over 25 rows. The big table is touched once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    rev_q = F.sum(
        F.floor(F.expr(_REVENUE) * 10000 + F.lit(0.5)).cast("long")
    ).alias("rev_q")
    per_nation = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(rev_q)
    )
    wreg = Window.partitionBy("r_name")
    return per_nation.select(
        F.col("r_name").alias("region_name"),
        F.col("n_name").alias("nation_name"),
        (F.col("rev_q") / F.lit(1e4)).alias("revenue"),
        (F.col("rev_q") / F.sum("rev_q").over(wreg)).alias("share"),
    ).orderBy("region_name", "nation_name")


REVENUE_SHARE_SQL = f"""
WITH per_nation AS (
  SELECT r_name, n_name,
         CAST(sum(CAST(floor(({_REVENUE}) * 10000 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_q
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name AS region_name,
       n_name AS nation_name,
       rev_q / 1e4 AS revenue,
       CAST(rev_q AS DOUBLE) / CAST(sum(rev_q) OVER (PARTITION BY r_name) AS DOUBLE)
         AS share
FROM per_nation
ORDER BY region_name, nation_name
"""


QUERIES = {
    "group_moments_lineitem": group_moments_lineitem,
    "rolling_anomaly_events": rolling_anomaly_events,
    "revenue_share_by_nation": revenue_share_by_nation,
}

ORACLES = {
    "group_moments_lineitem": GROUP_MOMENTS_SQL,
    "rolling_anomaly_events": ROLLING_ANOMALY_SQL,
    "revenue_share_by_nation": REVENUE_SHARE_SQL,
}


# ---------------------------------------------------------------------------
# One-pass correlation matrix
# ---------------------------------------------------------------------------

# (name, scaled-integer Spark expr, scaled-integer DuckDB expr); scales
# cancel in corr, so only exactness matters, not the grid factor
_CORR_COLS = [
    ("l_quantity", "cast(l_quantity as long)",
     "CAST(l_quantity AS BIGINT)"),
    ("l_extendedprice", "cast(floor(l_extendedprice * 100 + 0.5) as long)",
     "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"),
    ("l_discount", "cast(floor(l_discount * 100 + 0.5) as long)",
     "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"),
    ("l_tax", "cast(floor(l_tax * 100 + 0.5) as long)",
     "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)"),
]
_CORR_PAIRS = [
    (i, j) for i in range(len(_CORR_COLS)) for j in range(len(_CORR_COLS))
    if i < j
]


def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise Pearson correlation matrix of the lineitem
    numeric columns in ONE scan: 15 exact integer power sums (count, 4
    sums, 4 squares, 6 cross products — all DECIMAL(38,0), map-side
    combined) feed every matrix cell; each corr is then one fixed
    double chain over exact integers, so DuckDB matches bit-for-bit.
    The naive alternative — built-in corr() per pair — is 6 scans of
    doubles with partition-order-dependent rounding.

    Scale: the exchange carries 15 numbers per task regardless of
    input size; the matrix explode happens on the single aggregated
    row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    proj = li.select(
        *[F.expr(e).alias(f"v{i}") for i, (_, e, _) in enumerate(_CORR_COLS)]
    )
    aggs = [F.count("*").cast(dec).alias("n")]
    for i in range(len(_CORR_COLS)):
        aggs.append(F.sum(F.col(f"v{i}").cast(dec)).alias(f"s{i}"))
        aggs.append(
            F.sum(F.col(f"v{i}").cast(dec) * F.col(f"v{i}")).alias(f"q{i}")
        )
    for i, j in _CORR_PAIRS:
        aggs.append(
            F.sum(F.col(f"v{i}").cast(dec) * F.col(f"v{j}")).alias(f"c{i}{j}")
        )
    row = proj.agg(*aggs)

    def corr_expr(i: int, j: int):
        num = (F.col("n") * F.col(f"c{i}{j}") - F.col(f"s{i}") * F.col(f"s{j}")).cast("double")
        vx = (F.col("n") * F.col(f"q{i}") - F.col(f"s{i}") * F.col(f"s{i}")).cast("double")
        vy = (F.col("n") * F.col(f"q{j}") - F.col(f"s{j}") * F.col(f"s{j}")).cast("double")
        return num / (F.sqrt(vx) * F.sqrt(vy))

    cells = row.select(
        *[corr_expr(i, j).alias(f"corr{i}{j}") for i, j in _CORR_PAIRS]
    )
    stack_args = ", ".join(
        f"'{_CORR_COLS[i][0]}', '{_CORR_COLS[j][0]}', corr{i}{j}"
        for i, j in _CORR_PAIRS
    )
    return cells.selectExpr(
        f"stack({len(_CORR_PAIRS)}, {stack_args}) AS (col_x, col_y, corr)"
    ).orderBy("col_x", "col_y")


def _corr_matrix_sql() -> str:
    sums = ["CAST(count(*) AS HUGEINT) AS n"]
    for i, (_, _, de) in enumerate(_CORR_COLS):
        sums.append(f"sum(CAST({de} AS HUGEINT)) AS s{i}")
        sums.append(f"sum(CAST({de} AS HUGEINT) * {de}) AS q{i}")
    for i, j in _CORR_PAIRS:
        da, db = _CORR_COLS[i][2], _CORR_COLS[j][2]
        sums.append(f"sum(CAST({da} AS HUGEINT) * {db}) AS c{i}{j}")
    cells = []
    for i, j in _CORR_PAIRS:
        na, nb = _CORR_COLS[i][0], _CORR_COLS[j][0]
        cells.append(
            f"SELECT '{na}' AS col_x, '{nb}' AS col_y,\n"
            f"  CAST(n * c{i}{j} - s{i} * s{j} AS DOUBLE)\n"
            f"  / (sqrt(CAST(n * q{i} - s{i} * s{i} AS DOUBLE))\n"
            f"     * sqrt(CAST(n * q{j} - s{j} * s{j} AS DOUBLE))) AS corr\n"
            f"FROM sums"
        )
    body = "\nUNION ALL\n".join(cells)
    return (
        "WITH sums AS (\n  SELECT " + ",\n         ".join(sums)
        + "\n  FROM lineitem\n)\n" + body + "\nORDER BY col_x, col_y"
    )


CORR_MATRIX_SQL = _corr_matrix_sql()

QUERIES["corr_matrix_lineitem"] = corr_matrix_lineitem
ORACLES["corr_matrix_lineitem"] = CORR_MATRIX_SQL


# --------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov drift monitor
# --------------------------------------------------------------------------


def ks_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: the EXACT two-sample KS statistic
    of each source's document-length distribution against the rest of
    the corpus — the pipeline gate that catches a scraper change or a
    broken extractor shifting a source's length profile long before
    aggregate means move.

    Exact, not binned: D = max_x |F_src(x) − F_rest(x)| evaluated at
    every observed length over the shared value spine, carried as the
    integer cross-product |cum_src·N_rest − cum_rest·N_src| and
    divided ONCE onto the ppm grid — engine-identical, no float CDFs.
    The argmax length (tie → smallest) is reported so the drift is
    actionable.

    Scale: lengths aggregate to the (source, x) grain first (one
    fact-table shuffle); the spine is distinct-lengths × sources
    (bounded by value cardinality, not rows), windows partition by
    source, and the final argmax is a row_number over the spine —
    nothing touches the corpus twice."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("x")
    )
    n_tot = docs.count()
    cnt = docs.groupBy("source", "x").agg(F.count("*").alias("c"))
    tot_x = docs.groupBy("x").agg(F.count("*").alias("ct"))
    n_src = docs.groupBy("source").agg(F.count("*").alias("ns"))
    spine = (
        docs.select("x").distinct()
        .crossJoin(docs.select("source").distinct())
    )
    g = (
        spine.join(cnt, ["source", "x"], "left")
        .join(tot_x, "x")
        .join(n_src, "source")
        .select(
            "source",
            "x",
            F.coalesce(F.col("c"), F.lit(0)).alias("cs"),
            (F.col("ct") - F.coalesce(F.col("c"), F.lit(0))).alias("cr"),
            "ns",
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = (
        g.withColumn("cum_s", F.sum("cs").over(w))
        .withColumn("cum_r", F.sum("cr").over(w))
        .withColumn(
            "d_scaled",
            F.abs(
                F.col("cum_s") * (F.lit(n_tot) - F.col("ns"))
                - F.col("cum_r") * F.col("ns")
            ),
        )
    )
    warg = Window.partitionBy("source").orderBy(
        F.desc("d_scaled"), F.asc("x")
    )
    return (
        scored.withColumn("rn", F.row_number().over(warg))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            F.col("ns").cast("long").alias("n_docs"),
            F.expr(
                f"CAST(d_scaled * 1000000 DIV (ns * ({n_tot} - ns)) AS BIGINT)"
            ).alias("ks_ppm"),
            F.col("x").cast("long").alias("ks_at_len"),
        )
        .orderBy("source")
    )


KS_DRIFT_SQL = """
WITH docs AS (
  SELECT source, n_chars AS x FROM documents
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM docs),
cnt AS (
  SELECT source, x, CAST(count(*) AS BIGINT) AS c FROM docs GROUP BY 1, 2
), tot_x AS (
  SELECT x, CAST(count(*) AS BIGINT) AS ct FROM docs GROUP BY 1
), n_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS ns FROM docs GROUP BY 1
), spine AS (
  SELECT s.source, v.x
  FROM (SELECT DISTINCT source FROM docs) s,
       (SELECT DISTINCT x FROM docs) v
), g AS (
  SELECT sp.source, sp.x,
         coalesce(c.c, 0) AS cs,
         t.ct - coalesce(c.c, 0) AS cr,
         ns.ns
  FROM spine sp
  LEFT JOIN cnt c ON sp.source = c.source AND sp.x = c.x
  JOIN tot_x t ON sp.x = t.x
  JOIN n_src ns ON sp.source = ns.source
), scored AS (
  SELECT source, x, ns,
         sum(cs) OVER w AS cum_s,
         sum(cr) OVER w AS cum_r
  FROM g
  WINDOW w AS (PARTITION BY source ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), d AS (
  SELECT source, x, ns,
         abs(cum_s * ((SELECT n_tot FROM n) - ns) - cum_r * ns) AS d_scaled
  FROM scored
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY d_scaled DESC, x) AS rn
  FROM d
)
SELECT source,
       ns AS n_docs,
       CAST(d_scaled * 1000000
            // (ns * ((SELECT n_tot FROM n) - ns)) AS BIGINT) AS ks_ppm,
       CAST(x AS BIGINT) AS ks_at_len
FROM ranked
WHERE rn = 1
ORDER BY source
"""

QUERIES["ks_drift_by_source"] = ks_drift_by_source
ORACLES["ks_drift_by_source"] = KS_DRIFT_SQL


PSI_BUCKET_W = 50  # fixed-width length buckets for the PSI profile


def psi_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per source vs rest-of-corpus — the
    feature-monitoring standard next to the KS statistic: PSI =
    Σ_b (p_b − q_b)·ln(p_b/q_b) over fixed-width length buckets, with
    add-one (Laplace) smoothing so empty buckets stay defined and the
    metric deterministic.

    Exactness discipline: the log ratio's operands are exact int64
    products ((c_s+1)(N_r+B) etc., all < 2^53 so the double division
    is bit-identical), each bucket's ln lands on the micro-nat grid
    (floor(ln·1e6 + 0.5) — the libm-parity rule doc_surprisal/PMI
    use), the (p−q) factor is carried as the integer cross-product,
    and ONE truncating division at the end yields PSI in micro-nats.

    Scale: one fact shuffle to (source, bucket) counts; the spine is
    buckets × sources (constant-bounded); everything after is
    arithmetic on that tiny grid."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", (F.col("n_chars") / PSI_BUCKET_W).cast("long").alias("b")
    )
    n_tot = docs.count()
    cnt = docs.groupBy("source", "b").agg(F.count("*").alias("c"))
    tot_b = docs.groupBy("b").agg(F.count("*").alias("ct"))
    n_src = docs.groupBy("source").agg(F.count("*").alias("ns"))
    n_buckets = docs.select("b").distinct().count()
    spine = (
        docs.select("b").distinct()
        .crossJoin(docs.select("source").distinct())
    )
    g = (
        spine.join(cnt, ["source", "b"], "left")
        .join(tot_b, "b")
        .join(n_src, "source")
        .select(
            "source",
            "b",
            "ns",
            (F.coalesce(F.col("c"), F.lit(0)) + 1).alias("cs1"),
            (
                F.col("ct") - F.coalesce(F.col("c"), F.lit(0)) + 1
            ).alias("cr1"),
        )
        .withColumn("nr", F.lit(n_tot) - F.col("ns"))
    )
    B = n_buckets
    num = F.col("cs1") * (F.col("nr") + F.lit(B))
    den = F.col("cr1") * (F.col("ns") + F.lit(B))
    terms = g.select(
        "source",
        "ns",
        "nr",
        (
            (num - den)
            * F.floor(
                F.log(num.cast("double") / den.cast("double")) * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long")
        ).alias("term"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.first("ns").alias("ns"),
            F.first("nr").alias("nr"),
            F.sum("term").alias("t"),
        )
        .select(
            "source",
            F.col("ns").cast("long").alias("n_docs"),
            F.expr(
                f"CAST(t DIV ((ns + {B}) * (nr + {B})) AS BIGINT)"
            ).alias("psi_micro"),
        )
        .orderBy("source")
    )


def _psi_sql() -> str:
    return f"""
WITH docs AS (
  SELECT source, CAST(n_chars // {PSI_BUCKET_W} AS BIGINT) AS b
  FROM documents
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM docs),
nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_b FROM docs),
cnt AS (
  SELECT source, b, CAST(count(*) AS BIGINT) AS c FROM docs GROUP BY 1, 2
), tot_b AS (
  SELECT b, CAST(count(*) AS BIGINT) AS ct FROM docs GROUP BY 1
), n_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS ns FROM docs GROUP BY 1
), spine AS (
  SELECT s.source, v.b
  FROM (SELECT DISTINCT source FROM docs) s,
       (SELECT DISTINCT b FROM docs) v
), g AS (
  SELECT sp.source, sp.b, ns.ns,
         (SELECT n_tot FROM n) - ns.ns AS nr,
         coalesce(c.c, 0) + 1 AS cs1,
         t.ct - coalesce(c.c, 0) + 1 AS cr1
  FROM spine sp
  LEFT JOIN cnt c ON sp.source = c.source AND sp.b = c.b
  JOIN tot_b t ON sp.b = t.b
  JOIN n_src ns ON sp.source = ns.source
), terms AS (
  SELECT source, ns, nr,
         (cs1 * (nr + (SELECT n_b FROM nb))
          - cr1 * (ns + (SELECT n_b FROM nb)))
         * CAST(floor(ln(CAST(cs1 * (nr + (SELECT n_b FROM nb)) AS DOUBLE)
                         / CAST(cr1 * (ns + (SELECT n_b FROM nb)) AS DOUBLE))
                      * 1000000 + 0.5) AS BIGINT) AS term
  FROM g
)
SELECT source,
       CAST(ns AS BIGINT) AS n_docs,
       CAST(sum(term) // ((ns + (SELECT n_b FROM nb))
                          * (nr + (SELECT n_b FROM nb))) AS BIGINT)
         AS psi_micro
FROM terms
GROUP BY source, ns, nr
ORDER BY source
"""


QUERIES["psi_drift_by_source"] = psi_drift_by_source
ORACLES["psi_drift_by_source"] = _psi_sql()


# ---------------------------------------------------------------------------
# OLS regression per group (exact power sums -> one double chain)
# ---------------------------------------------------------------------------


def ols_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(returnflag, linestatus) least-squares fit of extended
    price (y, dollars) against quantity (x): slope, intercept and R²
    from the SAME exact integer power sums group_moments_lineitem
    uses — slope = (nΣxy−ΣxΣy)/(nΣxx−Σx²), intercept = ȳ − slope·x̄,
    R² = cov²/(varx·vary) — each a single fixed chain of double ops
    over DECIMAL(38,0) integers, so DuckDB reproduces every bit.

    Scale: one partial-agg shuffle on a 6-value key; the exchange
    carries 6 rows of 6 sums per task regardless of input size (the
    regression itself is O(groups) post-shuffle arithmetic). The
    reference computes no statistics (SURVEY §0: one filter+sort
    query); this extends §2.4's aggregate surface."""
    li = load_table(spark, sf_dir, "lineitem")
    qx = F.col("l_quantity").cast("long")
    qy = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    dec = "decimal(38,0)"
    g = (
        li.select(qx.alias("qx"), qy.alias("qy"), "l_returnflag", "l_linestatus")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum("qx").alias("sx"),
            F.sum("qy").alias("sy"),
            F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
            F.sum(F.col("qy").cast(dec) * F.col("qy")).alias("syy"),
            F.sum(F.col("qx") * F.col("qy")).alias("sxy"),
        )
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    cov = (n.cast(dec) * F.col("sxy") - sx.cast(dec) * sy).cast("double")
    varx = (n.cast(dec) * F.col("sxx") - sx.cast(dec) * sx).cast("double")
    vary = (n.cast(dec) * F.col("syy") - sy.cast(dec) * sy).cast("double")
    slope_cents = cov / varx  # cents of price per unit of quantity
    # degenerate groups (constant x or y) leave the fit undefined:
    # NULL in both engines rather than an ANSI divide-by-zero
    ok_x = varx != 0
    return g.select(
        "l_returnflag",
        "l_linestatus",
        n,
        F.when(ok_x, slope_cents / F.lit(100.0)).alias("slope"),
        F.when(
            ok_x,
            (sy.cast("double") / n.cast("double")
             - slope_cents * (sx.cast("double") / n.cast("double")))
            / F.lit(100.0),
        ).alias("intercept"),
        F.when(ok_x & (vary != 0), cov * cov / (varx * vary)).alias("r2"),
    ).orderBy("l_returnflag", "l_linestatus")


OLS_SQL = """
WITH sums AS (
  SELECT l_returnflag, l_linestatus,
         CAST(count(*) AS BIGINT)                          AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)   AS sx,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT)                                   AS sy,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT)                                   AS sxx,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)
             * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS syy,
         CAST(sum(CAST(l_quantity AS BIGINT)
             * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT)                                   AS sxy
  FROM lineitem GROUP BY l_returnflag, l_linestatus
), c AS (
  SELECT l_returnflag, l_linestatus, n, sx, sy,
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
           AS cov,
         CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
           AS varx,
         CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
           AS vary
  FROM sums
)
SELECT l_returnflag, l_linestatus, n,
       CASE WHEN varx <> 0 THEN (cov / varx) / 100.0 END   AS slope,
       CASE WHEN varx <> 0 THEN
         (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
          - (cov / varx) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 100.0
       END                                                 AS intercept,
       CASE WHEN varx <> 0 AND vary <> 0
            THEN cov * cov / (varx * vary) END             AS r2
FROM c
ORDER BY l_returnflag, l_linestatus
"""


QUERIES["ols_by_group"] = ols_by_group
ORACLES["ols_by_group"] = OLS_SQL


# ---------------------------------------------------------------------------
# CUSUM change-point scan per event type
# ---------------------------------------------------------------------------

CUSUM_TAU = 1.358  # sup|Brownian bridge| 95% critical value (Kolmogorov)


def cusum_changepoint_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM change-point scan per event type: the point where
    the centered prefix sum |Σ_{j≤i} x_j − i·μ| peaks, plus the
    bridge-normalized statistic C = max|·|/(σ√n) and a drift flag at
    the 95% Kolmogorov critical value.

    Float-free until the last step: x rides the cents grid, the
    centered prefix is carried as the exact integer n·P_i − i·S
    (DECIMAL(38,0) — n·P ≈ 2^41 at sf0.1, headroom to ~sf1e7), the
    argmax row is picked by integer ordering (ties broken on ts,
    event_id), and C is ONE fixed chain over exact integers:
    |nD| / (√(nΣx²−S²)·√n). The flag compares two identically-
    computed doubles, so both engines agree bitwise.

    Scale: one shuffle partitions by event_type; the prefix sum is a
    linear in-partition window scan and the group sums ride the same
    partitioning (no second exchange). Keys are independent, so a
    1000-executor cluster works keys in parallel; a single giant
    series would instead use the two-pass segmented prefix-sum
    (per-partition partials -> broadcast offsets) that
    window_running_total documents."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pfx = ev.select(
        "event_type",
        "ts",
        "event_id",
        "x",
        F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("pfx"),
        F.row_number().over(w).alias("i"),
    )
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    dec = "decimal(38,0)"
    d = pfx.join(g, "event_type").select(
        "event_type",
        "ts",
        "event_id",
        "i",
        "n",
        "s",
        "q",
        F.abs(
            F.col("n").cast(dec) * F.col("pfx") - F.col("i").cast(dec) * F.col("s")
        ).alias("abs_nd"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("abs_nd").desc(), "ts", "event_id"
    )
    spread = (
        F.col("n").cast(dec) * F.col("q") - F.col("s").cast(dec) * F.col("s")
    )
    # a constant series has zero variance: the statistic is undefined
    # (NULL) and no drift can be claimed (surfaced by the hypothesis
    # random-table test, which generates degenerate groups)
    stat = F.when(
        spread > 0,
        F.col("abs_nd").cast("double")
        / (F.sqrt(spread.cast("double")) * F.sqrt(F.col("n").cast("double"))),
    )
    return (
        d.withColumn("rk", F.row_number().over(pick))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            F.col("ts").alias("change_ts"),
            F.col("i").cast("long").alias("change_pos"),
            F.col("abs_nd").cast("long").alias("abs_nd"),
            stat.alias("cusum_stat"),
            F.coalesce(stat > F.lit(CUSUM_TAU), F.lit(False)).alias(
                "drift_flag"
            ),
        )
        .orderBy("event_type")
    )


CUSUM_SQL = f"""
WITH x AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
), p AS (
  SELECT event_type, ts, event_id, x,
         sum(x) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS i
  FROM x
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(x * x) AS BIGINT) AS q
  FROM x GROUP BY event_type
), d AS (
  SELECT p.event_type, p.ts, p.event_id, p.i, g.n, g.s, g.q,
         abs(CAST(g.n AS HUGEINT) * p.pfx - CAST(p.i AS HUGEINT) * g.s)
           AS abs_nd
  FROM p JOIN g USING (event_type)
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs_nd DESC, ts, event_id) AS rk,
         CASE WHEN CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s > 0
              THEN CAST(abs_nd AS DOUBLE)
                   / (sqrt(CAST(CAST(n AS HUGEINT) * q
                                - CAST(s AS HUGEINT) * s AS DOUBLE))
                      * sqrt(CAST(n AS DOUBLE)))
         END AS cusum_stat
  FROM d
)
SELECT event_type,
       n AS n_events,
       ts AS change_ts,
       CAST(i AS BIGINT) AS change_pos,
       CAST(abs_nd AS BIGINT) AS abs_nd,
       cusum_stat,
       coalesce(cusum_stat > {CUSUM_TAU}, FALSE) AS drift_flag
FROM r WHERE rk = 1
ORDER BY event_type
"""


QUERIES["cusum_changepoint_scan"] = cusum_changepoint_scan
ORACLES["cusum_changepoint_scan"] = CUSUM_SQL


# ---------------------------------------------------------------------------
# Benford first-digit conformance (data-quality screen)
# ---------------------------------------------------------------------------


def benford_digit_dq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs
    Benford's law — the classic fraud/corruption screen for monetary
    columns. Per digit d∈1..9: observed count, expected count on the
    micro grid (n·p_d where p_d = floor(log10(1+1/d)·1e6+0.5) — the
    same libm-parity rule the PSI/PMI family uses), the signed ppm
    deviation 1e6·O_d − n·p_d, and the per-digit χ² contribution
    (1e6·O−n·p)² // (n·p) — exact integer throughout (the square
    rides DECIMAL(38,0); ≈10^24 at sf0.1, headroom to ~sf1e6).

    Scale: the digit is unary string arithmetic on the cents grid
    (JVM-side, codegen), one partial-agg shuffle to a 9-row spine,
    then constant-size arithmetic. The left join onto the 1..9 spine
    keeps zero-observed digits defined."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    v = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    # population is defined on the CENTS grid in BOTH engines: a row
    # with 0 < price < 0.005 floors to v=0, which has no first digit
    # in 1..9 — filtering v >= 1 here and in the oracle keeps the
    # digit cells and n_tot computed over the identical row set
    obs = (
        orders.select(v.alias("v"))
        .where(F.col("v") >= 1)
        .select(
            F.substring(F.col("v").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
    )
    dec = "decimal(38,0)"
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    p_micro = F.floor(
        F.log((F.col("digit").cast("double") + F.lit(1.0)) / F.col("digit").cast("double"))
        / F.log(F.lit(10.0))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    # first digits of positive integers are exhaustive over 1..9, so
    # n_tot = Σ n_obs over the spine — a window sum over 9 rows, not a
    # second scan of the fact table
    wall = Window.partitionBy()
    g = (
        spine.join(F.broadcast(obs), "digit", "left")
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
            p_micro.alias("p_micro"),
        )
        .withColumn("exp_micro", F.sum("n_obs").over(wall) * F.col("p_micro"))
        .withColumn(
            "dev_ppm", F.lit(1_000_000) * F.col("n_obs") - F.col("exp_micro")
        )
    )
    return g.select(
        "digit",
        "n_obs",
        "exp_micro",
        "dev_ppm",
        F.when(
            F.col("exp_micro") > 0,
            F.expr(
                f"CAST((CAST(dev_ppm AS {dec}) * dev_ppm) DIV exp_micro"
                " AS BIGINT)"
            ),
        ).alias("chi2_term"),
    ).orderBy("digit")


BENFORD_SQL = """
WITH o AS (
  -- cents-grid population, identical to the Spark side: v >= 1 drops
  -- sub-half-cent rows that have no first digit in 1..9
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders
  WHERE o_totalprice > 0 AND floor(o_totalprice * 100 + 0.5) >= 1
), obs AS (
  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM o GROUP BY 1
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM o),
spine AS (
  SELECT CAST(range AS INT) AS digit FROM range(1, 10)
), g AS (
  SELECT s.digit,
         coalesce(obs.n_obs, 0) AS n_obs,
         (SELECT n_tot FROM n)
           * CAST(floor(ln((CAST(s.digit AS DOUBLE) + 1.0)
                           / CAST(s.digit AS DOUBLE))
                        / ln(10.0) * 1e6 + 0.5) AS BIGINT) AS exp_micro
  FROM spine s LEFT JOIN obs ON s.digit = obs.digit
), d AS (
  SELECT digit, n_obs, exp_micro,
         1000000 * n_obs - exp_micro AS dev_ppm
  FROM g
)
SELECT digit, n_obs, exp_micro, dev_ppm,
       CASE WHEN exp_micro > 0 THEN
         CAST((CAST(dev_ppm AS HUGEINT) * dev_ppm) // exp_micro AS BIGINT)
       END AS chi2_term
FROM d
ORDER BY digit
"""


QUERIES["benford_digit_dq"] = benford_digit_dq
ORACLES["benford_digit_dq"] = BENFORD_SQL


# ---------------------------------------------------------------------------
# Robust statistics: MAD and trimmed mean per group
# ---------------------------------------------------------------------------


def mad_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and median-absolute-deviation of event value per event
    type — the robust (breakdown-point-0.5) counterparts of mean/σ
    that heavy-tailed telemetry needs.

    Exactness: values ride the cents grid, so both medians are type-7
    interpolations between integers (or half-grid deviations) —
    (a+b)/2 on dyadic grids is exact in IEEE double, and Spark's
    `percentile` and DuckDB's `quantile_cont` share the
    p·(n−1)-position definition bit-for-bit here.

    Scale: percentile is an exact-rank aggregate (per-group sort in
    the agg buffer); two passes — median, then deviation median — with
    the 5-row median relation broadcast back. For a wide-key version
    at 100 TB the mergeable-histogram twin
    (equi_depth_price_buckets_approx) is the registered scale path."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("x"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(x, 0.5)").alias("med_cents"),
        F.count("*").alias("n_events"),
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "n_events",
        "med_cents",
        F.abs(F.col("x").cast("double") - F.col("med_cents")).alias("dev"),
    )
    return (
        dev.groupBy("event_type", "n_events", "med_cents")
        .agg(F.expr("percentile(dev, 0.5)").alias("mad_cents"))
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            (F.col("med_cents") / F.lit(100.0)).alias("median_value"),
            (F.col("mad_cents") / F.lit(100.0)).alias("mad_value"),
        )
        .orderBy("event_type")
    )


MAD_SQL = """
WITH x AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
), med AS (
  SELECT event_type, quantile_cont(x, 0.5) AS med_cents,
         CAST(count(*) AS BIGINT) AS n_events
  FROM x GROUP BY event_type
), dev AS (
  SELECT x.event_type, med.n_events,
         abs(CAST(x.x AS DOUBLE) - med.med_cents) AS dev
  FROM x JOIN med ON x.event_type = med.event_type
)
SELECT d.event_type,
       d.n_events,
       (SELECT med_cents FROM med m WHERE m.event_type = d.event_type) / 100.0
         AS median_value,
       quantile_cont(d.dev, 0.5) / 100.0 AS mad_value
FROM dev d
GROUP BY d.event_type, d.n_events
ORDER BY d.event_type
"""


QUERIES["mad_by_group"] = mad_by_group
ORACLES["mad_by_group"] = MAD_SQL


TRIM_PCT = 5  # drop the lowest/highest 5% before averaging


def trimmed_mean_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean of event value per event type: drop the
    ⌊n·0.05⌋ smallest and largest observations (ties broken on ts,
    event_id so the cut is total-order deterministic) and average the
    rest — outlier-robust without the median's information loss.

    Exact: ranks are integers, the surviving sum rides the cents
    grid, and the mean is one double division of exact ints.

    Scale: one shuffle to partition by event_type; rank and both
    group counts ride the same in-partition sort (a single window
    pipeline, no second exchange before the final agg)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy("x", "ts", "event_id")
    ranked = ev.select(
        "event_type",
        "x",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    k = F.floor(F.col("n") * TRIM_PCT / 100).cast("long")
    kept = ranked.where((F.col("rk") > k) & (F.col("rk") <= F.col("n") - k))
    return (
        kept.groupBy("event_type")
        .agg(
            F.first("n").cast("long").alias("n_events"),
            F.count("*").alias("n_kept"),
            F.sum("x").alias("s"),
        )
        .select(
            "event_type",
            "n_events",
            "n_kept",
            (F.col("s").cast("double") / F.col("n_kept").cast("double")
             / F.lit(100.0)).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


TRIMMED_MEAN_SQL = f"""
WITH x AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
), ranked AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY x, ts, event_id) AS rk,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM x
), kept AS (
  SELECT * FROM ranked
  WHERE rk > n * {TRIM_PCT} // 100 AND rk <= n - n * {TRIM_PCT} // 100
)
SELECT event_type,
       CAST(min(n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0
         AS trimmed_mean
FROM kept
GROUP BY event_type
ORDER BY event_type
"""


QUERIES["trimmed_mean_by_group"] = trimmed_mean_by_group
ORACLES["trimmed_mean_by_group"] = TRIMMED_MEAN_SQL


# ---------------------------------------------------------------------------
# Chi-square independence test (event type x day of week)
# ---------------------------------------------------------------------------


def chi2_independence_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² independence screen on the event-type × day-of-week
    contingency table — "is traffic mix stable across the week?".
    Per cell: observed count, expected count in milli-units
    (R_i·C_j·1000 // n), and the χ² contribution in micro-units
    ((n·O − R·C)²·1e6 // (n·R·C)) — all exact integers (the squared
    cross term tops out near 10^26 at sf0.1, inside DECIMAL(38,0)).

    Scale: one partial-agg shuffle to the (types × 7) cell grid;
    margins derive from the cells (grouped re-aggregation of a
    constant-size relation), so the fact table is scanned once."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").alias("dow")
    )
    cells = ev.groupBy("event_type", "dow").agg(F.count("*").alias("o"))
    rows_m = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("dow").agg(F.sum("o").alias("c"))
    # n rides a window sum over the cell GRID (bounded), so the fact
    # table really is scanned once — no second count job
    wall = Window.partitionBy()
    dec = "decimal(38,0)"
    g = (
        cells.join(F.broadcast(rows_m), "event_type")
        .join(F.broadcast(cols_m), "dow")
        .withColumn("n_tot", F.sum("o").over(wall))
        .select(
            "event_type",
            "dow",
            F.col("o").cast("long").alias("n_obs"),
            F.expr("CAST(r * c * 1000 DIV n_tot AS BIGINT)").alias(
                "exp_milli"
            ),
            (
                F.col("n_tot").cast(dec) * F.col("o")
                - F.col("r").cast(dec) * F.col("c")
            ).alias("cross"),
            (F.col("n_tot").cast(dec) * F.col("r") * F.col("c")).alias("den"),
        )
    )
    return g.select(
        "event_type",
        "dow",
        "n_obs",
        "exp_milli",
        F.expr("CAST(cross * cross * 1000000 DIV den AS BIGINT)").alias(
            "chi2_term_micro"
        ),
    ).orderBy("event_type", "dow")


CHI2_SQL = """
WITH ev AS (
  SELECT event_type, CAST(dayofweek(ts) AS INT) + 1 AS dow FROM events
), cells AS (
  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS o
  FROM ev GROUP BY event_type, dow
), rm AS (
  SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY event_type
), cm AS (
  SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY dow
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM ev),
g AS (
  SELECT cells.event_type, cells.dow, cells.o AS n_obs,
         rm.r * cm.c * 1000 // (SELECT n_tot FROM n) AS exp_milli,
         CAST((SELECT n_tot FROM n) AS HUGEINT) * cells.o
           - CAST(rm.r AS HUGEINT) * cm.c AS crs,
         CAST((SELECT n_tot FROM n) AS HUGEINT) * rm.r * cm.c AS den
  FROM cells JOIN rm ON cells.event_type = rm.event_type
             JOIN cm ON cells.dow = cm.dow
)
SELECT event_type, dow, n_obs,
       CAST(exp_milli AS BIGINT) AS exp_milli,
       CAST(crs * crs * 1000000 // den AS BIGINT) AS chi2_term_micro
FROM g
ORDER BY event_type, dow
"""


QUERIES["chi2_independence_events"] = chi2_independence_events
ORACLES["chi2_independence_events"] = CHI2_SQL


# ---------------------------------------------------------------------------
# Gini concentration per source
# ---------------------------------------------------------------------------


def gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document length per source — the standard
    inequality summary for a corpus (0 = every doc the same size,
    → 1 = a few giants carry all the bytes). A mixture planner reads
    this next to token_budget_by_source: equal budgets from sources
    with wildly different concentration behave differently downstream.

    Exact: with lengths sorted ascending and ranked 1..n inside each
    source (ties on doc_id — rank·value sums are tie-order invariant),
    G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx). Both sides are exact int64
    (Σi·x ≲ n²·max_len ≈ 2^50 at sf0.1-per-source; DECIMAL(38,0) for
    headroom), emitted plus ONE double division for the ratio.

    Scale: one shuffle partitions docs by source; the rank window and
    the sums ride that partitioning — sources are independent, so a
    1000-executor cluster works them in parallel (never a global
    sort)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.col("n_chars").cast("long").alias("x")
    )
    w = Window.partitionBy("source").orderBy("x", "doc_id")
    dec = "decimal(38,0)"
    ranked = docs.select(
        "source", "x", F.row_number().over(w).cast("long").alias("i")
    )
    g = ranked.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i").cast(dec) * F.col("x")).alias("six"),
    )
    num = (F.lit(2).cast(dec) * F.col("six")
           - (F.col("n") + 1).cast(dec) * F.col("sx"))
    den = F.col("n").cast(dec) * F.col("sx")
    return g.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("sx").cast("long").alias("total_chars"),
        num.cast("long").alias("gini_num"),
        den.cast("long").alias("gini_den"),
        (num.cast("double") / den.cast("double")).alias("gini"),
    ).orderBy("source")


GINI_SQL = """
WITH ranked AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY n_chars, doc_id) AS BIGINT) AS i
  FROM documents
), g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         sum(CAST(i AS HUGEINT) * x) AS six
  FROM ranked GROUP BY source
)
SELECT source,
       n AS n_docs,
       sx AS total_chars,
       CAST(2 * six - CAST(n + 1 AS HUGEINT) * sx AS BIGINT) AS gini_num,
       CAST(CAST(n AS HUGEINT) * sx AS BIGINT) AS gini_den,
       CAST(CAST(2 * six - CAST(n + 1 AS HUGEINT) * sx AS BIGINT) AS DOUBLE)
         / CAST(CAST(CAST(n AS HUGEINT) * sx AS BIGINT) AS DOUBLE) AS gini
FROM g
ORDER BY source
"""


QUERIES["gini_by_source"] = gini_by_source
ORACLES["gini_by_source"] = GINI_SQL


# ---------------------------------------------------------------------------
# Quantile normalization of per-source lengths onto the global grid
# ---------------------------------------------------------------------------


def quantile_normalize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize document length per source: each doc maps to
    the GLOBAL length distribution's value at the doc's within-source
    quantile — after this, every source has (as nearly as ranks allow)
    the same length distribution, the microarray-style correction for
    batch effects a mixture planner applies before comparing sources.

    Pure rank arithmetic, no floats: within-source rank r of n_s docs
    targets global 0-based position j = round((r−1)·(N−1)/(n_s−1))
    (integer round-half-up; a 1-doc source maps to the global median
    position). The global order statistic at j comes from the
    VALUE-GRAIN cumulative histogram — (value, start, end) position
    ranges — never a data-sized global sort: the spine is
    length-cardinality bounded (the KS/PSI discipline), broadcast into
    a range join.

    Scale: one per-source rank window (sources independent), one
    value-grain aggregation, a constant-size spine cumsum, one
    broadcast range join. Nothing global touches row-sized data."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("x")
    )
    n_tot = docs.count()
    ws = Window.partitionBy("source").orderBy("x", "doc_id")
    ranked = docs.select(
        "doc_id",
        "source",
        "x",
        F.row_number().over(ws).cast("long").alias("r"),
        F.count("*").over(Window.partitionBy("source")).cast("long").alias("ns"),
    )
    # integer round-half-up via DIV — the double-division shortcut is
    # only exact below 2^53 and this must hold at any rank magnitude
    j = F.when(F.col("ns") == 1, F.lit((n_tot - 1) // 2)).otherwise(
        F.expr(
            f"(2 * (r - 1) * {n_tot - 1} + (ns - 1)) div (2 * (ns - 1))"
        )
    ).cast("long")
    hist = docs.groupBy("x").agg(F.count("*").alias("c"))
    # global window is value-grain bounded: |hist| = distinct length
    # values (the value grid), never row grain
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    spine = hist.select(
        F.col("x").alias("v"),
        F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("start"),
        (F.coalesce(F.sum("c").over(wv), F.lit(0)) + F.col("c") - 1).alias(
            "end"
        ),
    )
    return (
        ranked.withColumn("j", j)
        .join(
            F.broadcast(spine),
            (F.col("j") >= F.col("start")) & (F.col("j") <= F.col("end")),
        )
        .select(
            "doc_id",
            "source",
            F.col("x").alias("n_chars"),
            F.col("v").alias("qnorm_chars"),
        )
        .orderBy("doc_id")
    )


QUANTILE_NORM_SQL = """
WITH docs AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x FROM documents
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM docs),
ranked AS (
  SELECT doc_id, source, x,
         CAST(row_number() OVER (PARTITION BY source ORDER BY x, doc_id)
              AS BIGINT) AS r,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns
  FROM docs
), tgt AS (
  SELECT doc_id, source, x,
         CASE WHEN ns = 1 THEN ((SELECT n_tot FROM n) - 1) // 2
              ELSE (2 * (r - 1) * ((SELECT n_tot FROM n) - 1) + (ns - 1))
                   // (2 * (ns - 1))
         END AS j
  FROM ranked
), hist AS (
  SELECT x AS v, CAST(count(*) AS BIGINT) AS c FROM docs GROUP BY x
), spine AS (
  SELECT v,
         coalesce(sum(c) OVER (ORDER BY v
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS strt,
         coalesce(sum(c) OVER (ORDER BY v
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) + c - 1 AS fin
  FROM hist
)
SELECT t.doc_id, t.source, t.x AS n_chars, s.v AS qnorm_chars
FROM tgt t JOIN spine s ON t.j >= s.strt AND t.j <= s.fin
ORDER BY t.doc_id
"""


QUERIES["quantile_normalize_lengths"] = quantile_normalize_lengths
ORACLES["quantile_normalize_lengths"] = QUANTILE_NORM_SQL


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test per event type
# ---------------------------------------------------------------------------


def runs_test_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness per event type: the
    time-ordered value sequence is signed above/below its group median
    (median ties excluded, the standard treatment), runs of equal sign
    are counted with a lag window, and the z statistic
    (R − μ_R)/σ_R with μ_R = 2·n1·n2/n + 1 flags serial dependence —
    trending or oscillating feeds that CUSUM's mean-shift lens misses.

    Exact: the median is a type-7 quantile on the cents grid, signs
    and the run count R are integers, and z is ONE double chain over
    exact int64 products. Scale: the sign/lag pass rides one
    event_type partitioning (the cusum shape); the median join
    broadcasts a 5-row relation."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("x"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(x, 0.5)").alias("med")
    )
    signed = (
        ev.join(F.broadcast(med), "event_type")
        .where(F.col("x").cast("double") != F.col("med"))
        .select(
            "event_type",
            "ts",
            "event_id",
            (F.col("x").cast("double") > F.col("med")).cast("int").alias("sgn"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    runs = signed.select(
        "event_type",
        "sgn",
        F.when(
            F.lag("sgn").over(w).isNull() | (F.lag("sgn").over(w) != F.col("sgn")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    g = runs.groupBy("event_type").agg(
        F.sum("sgn").alias("n1"),
        (F.count("*") - F.sum("sgn")).alias("n2"),
        F.sum("is_start").alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    n = n1 + n2
    dec = "decimal(38,0)"
    two_n1n2 = (F.lit(2).cast(dec) * n1 * n2)
    mu_num = two_n1n2  # mu_R = 2 n1 n2 / n + 1
    var_num = two_n1n2 * (two_n1n2 - n.cast(dec))  # over n^2 (n-1)
    z = F.when(
        (n1 > 0) & (n2 > 0) & (n > 1),
        (r.cast("double")
         - (mu_num.cast("double") / n.cast("double") + F.lit(1.0)))
        / F.sqrt(
            var_num.cast("double")
            / (n.cast(dec) * n * (n - 1)).cast("double")
        ),
    )
    return g.select(
        "event_type",
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        r.cast("long").alias("n_runs"),
        z.alias("runs_z"),
    ).orderBy("event_type")


RUNS_TEST_SQL = """
WITH x AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
), med AS (
  SELECT event_type, quantile_cont(x, 0.5) AS med FROM x GROUP BY event_type
), signed AS (
  SELECT x.event_type, x.ts, x.event_id,
         CAST(CAST(x.x AS DOUBLE) > med.med AS INT) AS sgn
  FROM x JOIN med ON x.event_type = med.event_type
  WHERE CAST(x.x AS DOUBLE) <> med.med
), runs AS (
  SELECT event_type, sgn,
         CASE WHEN lag(sgn) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) IS DISTINCT FROM sgn
              THEN 1 ELSE 0 END AS is_start
  FROM signed
), g AS (
  SELECT event_type,
         CAST(sum(sgn) AS BIGINT) AS n1,
         CAST(count(*) - sum(sgn) AS BIGINT) AS n2,
         CAST(sum(is_start) AS BIGINT) AS r
  FROM runs GROUP BY event_type
)
SELECT event_type,
       n1 AS n_above,
       n2 AS n_below,
       r AS n_runs,
       CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1 THEN
         (CAST(r AS DOUBLE)
          - (CAST(2 * CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
               / CAST(n1 + n2 AS DOUBLE) + 1.0))
         / sqrt(CAST(2 * CAST(n1 AS HUGEINT) * n2
                     * (2 * CAST(n1 AS HUGEINT) * n2 - (n1 + n2)) AS DOUBLE)
                / CAST(CAST(n1 + n2 AS HUGEINT) * (n1 + n2)
                       * (n1 + n2 - 1) AS DOUBLE))
       END AS runs_z
FROM g
ORDER BY event_type
"""


QUERIES["runs_test_by_type"] = runs_test_by_type
ORACLES["runs_test_by_type"] = RUNS_TEST_SQL


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation per event type
# ---------------------------------------------------------------------------


def autocorr_lag1_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the time-ordered value series per
    event type — the serial-dependence summary next to the runs test's
    hypothesis flag: r1 = Σ(xᵢ−x̄)(xᵢ₊₁−x̄) / Σ(xᵢ−x̄)², computed as
    (n²·Σxy − n·S·(Sh+St) + (n−1)·S²) / (n·(n·Q − S²)) over exact
    integer sums (Σxy from a lag window over adjacent pairs; Sh/St
    are S minus the last/first element). One double division at the
    end — the power-sum discipline, bit-equal cross-engine.

    Scale: one event_type partitioning carries the lag window and all
    group sums (the cusum shape); n²Σxy ≈ 10²² at sf0.1 rides
    DECIMAL(38,0)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    staged = ev.select(
        "event_type",
        "x",
        F.lag("x").over(w).alias("xp"),
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    dec = "decimal(38,0)"
    g = staged.groupBy("event_type").agg(
        F.first("n").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("q"),
        F.sum(F.col("xp").cast(dec) * F.col("x")).alias("sxy"),
        F.sum(F.when(F.col("i") == 1, F.col("x")).otherwise(0)).alias("x1"),
        F.sum(F.when(F.col("i") == F.col("n"), F.col("x")).otherwise(0)).alias(
            "xn"
        ),
    )
    n, s, q = F.col("n").cast(dec), F.col("s"), F.col("q")
    sh = (F.col("s") - F.col("xn")).cast(dec)
    st = (F.col("s") - F.col("x1")).cast(dec)
    num = (
        n * n * F.col("sxy")
        - n * s * (sh + st)
        + (n - 1) * s.cast(dec) * s
    ).cast("double")
    den = (n * (n * q - s.cast(dec) * s)).cast("double")
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.when(den != 0, num / den).alias("acf_lag1"),
    ).orderBy("event_type")


AUTOCORR_SQL = """
WITH x AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
), staged AS (
  SELECT event_type, x,
         lag(x) OVER w AS xp,
         row_number() OVER w AS i,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM x
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), g AS (
  SELECT event_type,
         min(n) AS n,
         CAST(sum(x) AS BIGINT) AS s,
         sum(CAST(x AS HUGEINT) * x) AS q,
         sum(CAST(xp AS HUGEINT) * x) AS sxy,
         CAST(sum(CASE WHEN i = 1 THEN x ELSE 0 END) AS BIGINT) AS x1,
         CAST(sum(CASE WHEN i = n THEN x ELSE 0 END) AS BIGINT) AS xn
  FROM staged GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       CASE WHEN CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s <> 0 THEN
         CAST(CAST(n AS HUGEINT) * n * sxy
              - CAST(n AS HUGEINT) * s * ((s - xn) + (s - x1))
              + CAST(n - 1 AS HUGEINT) * s * s AS DOUBLE)
           / CAST(CAST(n AS HUGEINT)
                  * (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
                  AS DOUBLE)
       END AS acf_lag1
FROM g
ORDER BY event_type
"""


QUERIES["autocorr_lag1_by_type"] = autocorr_lag1_by_type
ORACLES["autocorr_lag1_by_type"] = AUTOCORR_SQL


# ---------------------------------------------------------------------------
# Daily lead-lag cross-correlation between event types
# ---------------------------------------------------------------------------

CCF_MAX_LAG = 3
CCF_X_TYPE = "view"
CCF_Y_TYPE = "purchase"


def crosscorr_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation of the view and purchase DAILY count series
    at lags −3..+3 — the lead-lag diagnostic ("do views predict
    purchases k days out?") behind attribution windows. corr(lag L)
    pairs x_day with y_{day+L} over the gapfilled shared day spine
    (missing days count 0 — absence is signal).

    Exact: daily counts are integers on a complete generated spine,
    per-lag Pearson runs on exact power sums (the ols_by_group
    chain). Scale: the fact table reduces once to (type, day) counts;
    everything after is arithmetic on the day-spine × 7 lags grid —
    constant-bounded, broadcast-joined."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(CCF_X_TYPE, CCF_Y_TYPE)
    )
    days = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("dn"),
    )
    bounds = days.agg(F.min("dn").alias("lo"), F.max("dn").alias("hi")).collect()[0]
    lo, hi = int(bounds.lo), int(bounds.hi)
    counts = days.groupBy("event_type", "dn").agg(F.count("*").alias("c"))
    spine = spark.range(lo, hi + 1).select(F.col("id").alias("dn"))

    def series(t: str, alias: str):
        return spine.join(
            counts.where(F.col("event_type") == t).select("dn", "c"), "dn", "left"
        ).select("dn", F.coalesce("c", F.lit(0)).cast("long").alias(alias))

    xa = series(CCF_X_TYPE, "x")
    xb = series(CCF_Y_TYPE, "y")
    lags = spark.range(-CCF_MAX_LAG, CCF_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    paired = (
        lags.crossJoin(xa)
        .withColumn("dn2", F.col("dn") + F.col("lag"))
        .join(xb.withColumnRenamed("dn", "dn2"), "dn2")
    )
    dec = "decimal(38,0)"
    g = paired.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = (n.cast(dec) * F.col("sxy") - sx.cast(dec) * sy).cast("double")
    vx = (n.cast(dec) * F.col("sxx") - sx.cast(dec) * sx).cast("double")
    vy = (n.cast(dec) * F.col("syy") - sy.cast(dec) * sy).cast("double")
    return g.select(
        "lag",
        n.cast("long").alias("n_days"),
        F.when((vx != 0) & (vy != 0), cov / (F.sqrt(vx) * F.sqrt(vy))).alias(
            "ccf"
        ),
    ).orderBy("lag")


CCF_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS dn
  FROM events WHERE event_type IN ('{CCF_X_TYPE}', '{CCF_Y_TYPE}')
), bounds AS (SELECT min(dn) AS lo, max(dn) AS hi FROM ev),
counts AS (
  SELECT event_type, dn, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY event_type, dn
), spine AS (
  SELECT CAST(unnest(generate_series((SELECT lo FROM bounds),
                                     (SELECT hi FROM bounds))) AS BIGINT)
    AS dn
), xa AS (
  SELECT s.dn, coalesce(c.c, 0) AS x
  FROM spine s LEFT JOIN counts c
    ON s.dn = c.dn AND c.event_type = '{CCF_X_TYPE}'
), xb AS (
  SELECT s.dn, coalesce(c.c, 0) AS y
  FROM spine s LEFT JOIN counts c
    ON s.dn = c.dn AND c.event_type = '{CCF_Y_TYPE}'
), lags AS (
  SELECT CAST(range AS BIGINT) AS lag
  FROM range(-{CCF_MAX_LAG}, {CCF_MAX_LAG} + 1)
), paired AS (
  SELECT l.lag, a.x, b.y
  FROM lags l
  JOIN xa a ON TRUE
  JOIN xb b ON b.dn = a.dn + l.lag
), g AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM paired GROUP BY lag
)
SELECT lag,
       n AS n_days,
       CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx <> 0
             AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy <> 0 THEN
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
           / (sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                        AS DOUBLE))
              * sqrt(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
                          AS DOUBLE)))
       END AS ccf
FROM g
ORDER BY lag
"""


QUERIES["crosscorr_daily_types"] = crosscorr_daily_types
ORACLES["crosscorr_daily_types"] = CCF_SQL


# ---------------------------------------------------------------------------
# Forecast-baseline evaluation (MASE) on daily event counts
# ---------------------------------------------------------------------------

MASE_SEASON = 7  # weekly seasonality


def forecast_baseline_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline scorecard per event type on the daily count
    series: mean absolute error of the naive forecast (yesterday's
    count) vs the seasonal-naive forecast (same weekday last week),
    plus their ratio — the MASE denominator convention
    (Hyndman-Koehler): any real forecasting model must beat these
    before it earns a deploy, and seasonal/naive already says whether
    the series has weekly structure.

    Exact: counts live on a gapfilled day spine per type (missing
    days are real zeros), absolute errors are integers, each MAE is
    one double division of exact sums, and the MASE ratio is the
    integer cross-product on the micro grid (NULL when the seasonal
    error is zero).

    Scale: one shuffle to (type, day) counts; the spine crossjoin is
    types × days (bounded); lag windows partition by type."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("dn"),
    )
    bounds = ev.agg(F.min("dn").alias("lo"), F.max("dn").alias("hi")).collect()[0]
    lo, hi = int(bounds.lo), int(bounds.hi)
    counts = ev.groupBy("event_type", "dn").agg(F.count("*").alias("c"))
    spine = (
        spark.range(lo, hi + 1)
        .select(F.col("id").alias("dn"))
        .crossJoin(ev.select("event_type").distinct())
    )
    series = spine.join(counts, ["event_type", "dn"], "left").select(
        "event_type", "dn", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("dn")
    lagged = series.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", MASE_SEASON).over(w).alias("c7"),
    ).where(F.col("c7").isNotNull())
    g = lagged.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum(F.abs(F.col("c") - F.col("c1"))).alias("ae1"),
        F.sum(F.abs(F.col("c") - F.col("c7"))).alias("ae7"),
    )
    return g.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        (F.col("ae1").cast("double") / F.col("n_days").cast("double")).alias(
            "mae_naive"
        ),
        (F.col("ae7").cast("double") / F.col("n_days").cast("double")).alias(
            "mae_seasonal"
        ),
        F.when(
            F.col("ae7") > 0,
            F.expr("CAST(ae1 * 1000000 DIV ae7 AS BIGINT)"),
        ).alias("mase_micro"),
    ).orderBy("event_type")


MASE_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS dn
  FROM events
), bounds AS (SELECT min(dn) AS lo, max(dn) AS hi FROM ev),
counts AS (
  SELECT event_type, dn, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY event_type, dn
), spine AS (
  SELECT t.event_type, CAST(d.dn AS BIGINT) AS dn
  FROM (SELECT DISTINCT event_type FROM ev) t,
       (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds))) AS dn) d
), series AS (
  SELECT s.event_type, s.dn, coalesce(c.c, 0) AS c
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s.dn = c.dn
), lagged AS (
  SELECT event_type, c,
         lag(c, 1) OVER w AS c1,
         lag(c, {MASE_SEASON}) OVER w AS c7
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY dn)
), l AS (SELECT * FROM lagged WHERE c7 IS NOT NULL),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(abs(c - c1)) AS BIGINT) AS ae1,
         CAST(sum(abs(c - c7)) AS BIGINT) AS ae7
  FROM l GROUP BY event_type
)
SELECT event_type, n_days,
       CAST(ae1 AS DOUBLE) / CAST(n_days AS DOUBLE) AS mae_naive,
       CAST(ae7 AS DOUBLE) / CAST(n_days AS DOUBLE) AS mae_seasonal,
       CASE WHEN ae7 > 0 THEN CAST(ae1 * 1000000 // ae7 AS BIGINT) END
         AS mase_micro
FROM g
ORDER BY event_type
"""


QUERIES["forecast_baseline_mase"] = forecast_baseline_mase
ORACLES["forecast_baseline_mase"] = MASE_SQL


# ---------------------------------------------------------------------------
# Watermark lateness profile (out-of-orderness measurement)
# ---------------------------------------------------------------------------


def watermark_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How late does each event type's data actually arrive? In
    arrival order (event_id — the ingest sequence), an event's
    LATENESS is running_max(event_time) − event_time: exactly the
    quantity a Structured-Streaming watermark bounds. The profile
    (max, p50/p95/p99 over late events, late fraction) is how you SET
    `withWatermark` from data instead of folklore — pick p99 and you
    know the drop rate you signed up for.

    Exact: lateness is integer seconds (running max via a window on
    the epoch-seconds grid), percentiles are type-7 over those
    integers, the late fraction is an integer ppm ratio.

    Scale: one shuffle partitions by event_type; the running max and
    the aggregate ride that partitioning. Same per-key-series note as
    cusum: a single giant key would use the segmented two-pass max."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.col("ts").cast("timestamp").cast("long").alias("t"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = ev.select(
        "event_type",
        (F.max("t").over(w) - F.col("t")).alias("late_s"),
    )
    g = late.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("late_s") > 0).cast("long")).alias("n_late"),
        F.max("late_s").alias("max_late_s"),
        F.expr("percentile(late_s, 0.5)").alias("p50_late_s"),
        F.expr("percentile(late_s, 0.95)").alias("p95_late_s"),
        F.expr("percentile(late_s, 0.99)").alias("p99_late_s"),
    )
    return g.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_late").cast("long").alias("n_late"),
        F.expr("CAST(n_late * 1000000 DIV n_events AS BIGINT)").alias(
            "late_ppm"
        ),
        F.col("max_late_s").cast("long").alias("max_late_s"),
        "p50_late_s",
        "p95_late_s",
        "p99_late_s",
    ).orderBy("event_type")


WATERMARK_LATENESS_SQL = """
WITH ev AS (
  SELECT event_type, event_id,
         CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
                        CAST(ts AS TIMESTAMP)) AS BIGINT) AS t
  FROM events
), late AS (
  SELECT event_type,
         max(t) OVER (PARTITION BY event_type ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - t AS late_s
  FROM ev
), g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(late_s > 0 AS BIGINT)) AS BIGINT) AS n_late,
         CAST(max(late_s) AS BIGINT) AS max_late_s,
         quantile_cont(late_s, 0.5) AS p50_late_s,
         quantile_cont(late_s, 0.95) AS p95_late_s,
         quantile_cont(late_s, 0.99) AS p99_late_s
  FROM late GROUP BY event_type
)
SELECT event_type, n_events, n_late,
       CAST(n_late * 1000000 // n_events AS BIGINT) AS late_ppm,
       max_late_s, p50_late_s, p95_late_s, p99_late_s
FROM g
ORDER BY event_type
"""


QUERIES["watermark_lateness_profile"] = watermark_lateness_profile
ORACLES["watermark_lateness_profile"] = WATERMARK_LATENESS_SQL


def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test + Sen's slope per event type
    over the daily event-count series — the standard nonparametric
    "is this metric drifting?" screen (no distributional assumption,
    robust to outliers), complementing runs_test (serial dependence)
    and cusum_changepoint_scan (level shift) in the drift battery.

    Exact integer core: S = Σ_{i<j} sign(c_j − c_i) over day pairs,
    and the tie-corrected variance NUMERATOR var18 = n(n−1)(2n+5) −
    Σ_t t(t−1)(2t+5) (the /18 left to the one double z chain, so the
    gated var18 column is pure int64). Sen's slope is the median of
    pairwise slopes on the micro grid ((Δcount·1e6)/Δdays as ONE
    double division per pair — IEEE-identical in both engines). The
    median itself is EXPLICIT middle-element selection (row_number
    against the pair count; even n averages the two middle values as
    (a+b)/2), not percentile()/quantile_cont(): the engines' linear
    interpolation formulas (lo+(hi−lo)·f vs lo·(1−f)+hi·f) can differ
    by an ulp on even-count groups, while element selection + one
    commutative add is bit-identical by construction.

    Scale: the series is DAY-grain per event type (bounded — the
    aggregate collapses the corpus before any pairing), so the pair
    self-join is O(days²) per type, constant-bounded like the
    crosscorr/KS spines; everything partitions by event_type, no
    global window."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count("*").cast("long").alias("c"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.signum(F.col("b.c") - F.col("a.c")).cast("long").alias("sgn"),
        (
            (F.col("b.c") - F.col("a.c")).cast("double")
            * F.lit(1000000.0)
            / (F.col("b.d") - F.col("a.d")).cast("double")
        ).alias("slope_micro"),
    )
    w = Window.partitionBy("event_type").orderBy("slope_micro")
    ranked = pairs.withColumn("rn", F.row_number().over(w)).withColumn(
        "np", F.count("*").over(Window.partitionBy("event_type"))
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("np") + 1) / 2))
            | (F.col("rn") == F.floor(F.col("np") / 2) + 1)
        )
        .groupBy("event_type")
        .agg(F.avg("slope_micro").alias("sen_slope_micro"))
    )
    ps = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("long").alias("s_stat"),
    ).join(med, "event_type")
    nties = (
        daily.groupBy("event_type", "c")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_levels"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("long").alias("tie_term"),
        )
    )
    nn = daily.groupBy("event_type").agg(F.count("*").cast("long").alias("n_days"))
    g = nn.join(nties, "event_type").join(ps, "event_type")
    n = F.col("n_days")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("long")
    sd = F.sqrt(var18.cast("double") / F.lit(18.0))
    s = F.col("s_stat")
    z = (
        F.when((var18 > 0) & (s > 0), (s.cast("double") - 1.0) / sd)
        .when((var18 > 0) & (s < 0), (s.cast("double") + 1.0) / sd)
        .otherwise(F.lit(0.0))
    )
    return g.select(
        "event_type",
        "n_days",
        "s_stat",
        var18.alias("var18"),
        z.alias("mk_z"),
        "sen_slope_micro",
    ).orderBy("event_type")


MANN_KENDALL_SQL = """
WITH daily AS (
  SELECT event_type,
         (CAST(ts AS DATE) - DATE '1970-01-01') AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CAST(sign(b.c - a.c) AS BIGINT) AS sgn,
         CAST(b.c - a.c AS DOUBLE) * 1000000.0
           / CAST(b.d - a.d AS DOUBLE) AS slope_micro
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
ranked AS (
  SELECT event_type, slope_micro,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope_micro) AS rn,
         count(*) OVER (PARTITION BY event_type) AS np
  FROM pairs
),
med AS (
  SELECT event_type, avg(slope_micro) AS sen_slope_micro
  FROM ranked
  WHERE rn = CAST(floor((np + 1) / 2.0) AS BIGINT)
     OR rn = CAST(floor(np / 2.0) AS BIGINT) + 1
  GROUP BY event_type
),
ps AS (
  SELECT p.event_type,
         CAST(sum(p.sgn) AS BIGINT) AS s_stat,
         any_value(m.sen_slope_micro) AS sen_slope_micro
  FROM pairs p JOIN med m ON p.event_type = m.event_type
  GROUP BY p.event_type
),
ties AS (
  SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
  FROM daily GROUP BY 1, 2
),
tsum AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM ties GROUP BY event_type
),
nn AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type
),
g AS (
  SELECT nn.event_type, nn.n_days, tsum.tie_term, ps.s_stat,
         ps.sen_slope_micro,
         CAST(nn.n_days * (nn.n_days - 1) * (2 * nn.n_days + 5)
              - tsum.tie_term AS BIGINT) AS var18
  FROM nn JOIN tsum ON nn.event_type = tsum.event_type
          JOIN ps ON nn.event_type = ps.event_type
)
SELECT event_type, n_days, s_stat, var18,
       CASE WHEN var18 > 0 AND s_stat > 0
              THEN (CAST(s_stat AS DOUBLE) - 1.0)
                   / sqrt(CAST(var18 AS DOUBLE) / 18.0)
            WHEN var18 > 0 AND s_stat < 0
              THEN (CAST(s_stat AS DOUBLE) + 1.0)
                   / sqrt(CAST(var18 AS DOUBLE) / 18.0)
            ELSE 0.0 END AS mk_z,
       sen_slope_micro
FROM g
ORDER BY event_type
"""

QUERIES["mann_kendall_trend"] = mann_kendall_trend
ORACLES["mann_kendall_trend"] = MANN_KENDALL_SQL
