"""Right-to-be-forgotten cascade audit: given a cohort of customers to
erase, report exactly how many rows each downstream table loses when
the deletion cascades through the foreign-key chain
customer → orders → lineitem.

The audit is the dry-run half of a GDPR erasure job — at 100 TB you
run THIS first (cheap: semi-join counts, no rewrites), compare against
retention policy, then execute the actual anti-join rewrites
per-partition. The cohort here is the deterministic slice
``c_custkey % FORGET_MOD == 0`` standing in for a request list.

Scale: each count is one semi-join keyed on the child's FK — the
cohort/orders key sets broadcast when small, hash-join otherwise; no
table is scanned more than once, and nothing is rewritten. The UNION
of three one-row aggregates is driver-trivial.

Reference: no counterpart (the reference only ever reads,
repository/ParameterDataRepository.java:53-78); extends the warehouse-
maintenance family (MERGE, SCD2, CDC, compaction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

FORGET_MOD = 97


def cascade_forget_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table deleted-row counts for the erasure cohort."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % FORGET_MOD == 0
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").join(
        F.broadcast(cust),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").join(
        orders,
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count("*").cast("long").alias("n_rows_deleted"),
        )

    return (
        one("customer", cust)
        .unionAll(one("orders", orders))
        .unionAll(one("lineitem", li))
        .orderBy("table_name")
    )


CASCADE_FORGET_SQL = f"""
WITH cohort AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {FORGET_MOD} = 0
), doomed_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM cohort)
), doomed_items AS (
  SELECT l_orderkey FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_orders)
)
SELECT 'customer' AS table_name,
       CAST((SELECT count(*) FROM cohort) AS BIGINT) AS n_rows_deleted
UNION ALL
SELECT 'lineitem', CAST((SELECT count(*) FROM doomed_items) AS BIGINT)
UNION ALL
SELECT 'orders', CAST((SELECT count(*) FROM doomed_orders) AS BIGINT)
ORDER BY table_name
"""


QUERIES = {"cascade_forget_audit": cascade_forget_audit}
ORACLES = {"cascade_forget_audit": CASCADE_FORGET_SQL}


# ---------------------------------------------------------------------------
# privacy auditing: k-anonymity / l-diversity and DP noisy release
# ---------------------------------------------------------------------------

K_ANON = 5  # minimum group size per quasi-identifier combination
L_DIV = 3  # minimum distinct users (sensitive attribute diversity)
KANON_VALUE_BUCKET = 50  # dollars per value bucket


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the events table before a
    release: the quasi-identifier combination (event_type, day-of-
    week, 50-unit value bucket) must cover >= K rows (re-identification
    resistance) and >= L distinct users (diversity of the sensitive
    attribute) — the table-level check a privacy review runs next to
    cascade_forget_audit's erasure accounting. Every combination is a
    row with its counts and both verdicts; violations sort first.

    Scale: one partial-agg shuffle to the quasi-identifier grid
    (types × 7 × value buckets — cardinality-bounded); distinct users
    ride the same exchange via count_distinct."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        (F.floor(F.col("value") / KANON_VALUE_BUCKET)).cast("long").alias(
            "value_bucket"
        ),
        "user_id",
    )
    g = ev.groupBy("event_type", "dow", "value_bucket").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return g.select(
        "event_type",
        "dow",
        "value_bucket",
        "n_rows",
        "n_users",
        (F.col("n_rows") >= K_ANON).alias("k_ok"),
        (F.col("n_users") >= L_DIV).alias("l_ok"),
    ).orderBy("k_ok", "l_ok", "event_type", "dow", "value_bucket")


K_ANON_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(dayofweek(ts) AS INT) + 1 AS dow,
         CAST(floor(value / {KANON_VALUE_BUCKET}) AS BIGINT) AS value_bucket,
         user_id
  FROM events
), g AS (
  SELECT event_type, dow, value_bucket,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM ev GROUP BY event_type, dow, value_bucket
)
SELECT event_type, dow, value_bucket, n_rows, n_users,
       n_rows >= {K_ANON} AS k_ok,
       n_users >= {L_DIV} AS l_ok
FROM g
ORDER BY k_ok, l_ok, event_type, dow, value_bucket
"""

QUERIES["k_anonymity_audit"] = k_anonymity_audit
ORACLES["k_anonymity_audit"] = K_ANON_SQL


DP_B = 1  # Laplace SCALE b = sensitivity/epsilon (sens 1, eps 1)


#: Published seed for the ORACLE-GATEABLE demo registry entry. A
#: release keyed by a public seed is NOT private — anyone can recompute
#: the noise — which is exactly why the demo entry is named
#: ``dp_laplace_demo`` and the real API below refuses to run without a
#: caller-supplied secret.
DP_DEMO_SEED = "public-demo-seed"


def dp_noisy_event_counts(
    spark: SparkSession, sf_dir: str, secret: str | None = None
) -> DataFrame:
    """Differentially-private count release per event type via the
    Laplace mechanism, derandomized through a keyed hash: the uniform
    is u = (h + 0.5)/2³² with h = md5-hash32("dp:" + secret + ":" +
    group key), then the standard inverse-CDF draw
    noise = −sgn(u−½)·b·ln(1 − 2|u−½|).

    The mechanism is private ONLY if ``secret`` is an unguessable
    value known solely to the data curator (the noise is a
    deterministic function of (secret, group key); a public or absent
    secret lets anyone recompute the noise and recover exact counts).
    It is therefore MANDATORY — this function fails loudly without it.
    The registry/demo twin ``dp_laplace_demo`` pins the published
    ``DP_DEMO_SEED`` so DuckDB can gate the arithmetic, and is named
    so it cannot be mistaken for an actual DP release.

    Exactness: u and 1−2|u−½| are one fixed double chain from an
    integer hash; the ln lands on the micro-nat grid; the released
    value is exact integer micro arithmetic (count·1e6 + noise_micro).

    Scale: one partial-agg count plus per-row-of-5 hash arithmetic."""
    from ..functions.hashing import stable_hash32

    if not secret:
        raise ValueError(
            "dp_noisy_event_counts requires a non-empty secret seed: "
            "without a secret the Laplace noise is recomputable by "
            "anyone and the release provides zero privacy. Pass "
            "secret=<curator-held value>, or use dp_laplace_demo if "
            "you only want the deterministic mechanism demo."
        )
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(F.count("*").alias("n_true"))
    h = stable_hash32(
        F.concat(F.lit(f"dp:{secret}:"), F.col("event_type"))
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    t = F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5))
    ln_micro = F.floor(F.log(t) * F.lit(1e6) + F.lit(0.5)).cast("long")
    sgn = F.when(u >= F.lit(0.5), F.lit(1)).otherwise(F.lit(-1))
    # X = -sgn(u-1/2) * b * ln(1-2|u-1/2|); b carried directly so the
    # epsilon accounting cannot invert (b = sens/eps, NOT eps itself)
    noise_micro = (F.lit(0) - sgn * F.lit(DP_B) * ln_micro).cast("long")
    return g.select(
        "event_type",
        "n_true",
        noise_micro.alias("noise_micro"),
        (F.col("n_true") * F.lit(1_000_000) + noise_micro).alias(
            "released_micro"
        ),
    ).orderBy("event_type")


from ..functions.hashing import stable_hash32_sql as _sh32_sql  # noqa: E402

_DP_HASH = _sh32_sql(f"'dp:{DP_DEMO_SEED}:' || event_type")

DP_SQL = f"""
WITH g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
  FROM events GROUP BY event_type
), h AS (
  SELECT event_type, n_true,
         (CAST({_DP_HASH} AS DOUBLE) + 0.5) / 4294967296.0 AS u
  FROM g
), n AS (
  SELECT event_type, n_true,
         CAST(0 - (CASE WHEN u >= 0.5 THEN 1 ELSE -1 END)
                * {DP_B}
                * CAST(floor(ln(1.0 - 2.0 * abs(u - 0.5)) * 1e6 + 0.5)
                       AS BIGINT) AS BIGINT) AS noise_micro
  FROM h
)
SELECT event_type, n_true, noise_micro,
       CAST(n_true * 1000000 + noise_micro AS BIGINT) AS released_micro
FROM n
ORDER BY event_type
"""

def dp_laplace_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Laplace-mechanism DEMO keyed by the published
    DP_DEMO_SEED — NOT a private release (the seed is public, so the
    noise is recomputable); exists to oracle-gate the mechanism's
    arithmetic. For an actual DP release call dp_noisy_event_counts
    with a curator-held secret."""
    return dp_noisy_event_counts(spark, sf_dir, secret=DP_DEMO_SEED)


QUERIES["dp_laplace_demo"] = dp_laplace_demo
ORACLES["dp_laplace_demo"] = DP_SQL
