"""Second relational batch: analytic frames, scalar function suites,
predicate varieties, percentiles, and the raw-SQL entry point.

These widen SURVEY §2 coverage (P5 predicate varieties, §2.5 frame
specs, §2.8 scalar functions) beyond the first batch. Conventions as
in plans/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import grid_sum_sql


def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec varieties on one pass: rows-frame moving average,
    ntile, percent_rank, first/last value in a bounded frame."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    moving = w.rowsBetween(-2, Window.currentRow)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.avg("o_totalprice").over(moving), 4).alias("moving_avg3"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.first("o_orderkey").over(full).alias("first_order"),
            F.last("o_orderkey").over(full).alias("last_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_FRAMES_SQL = """
SELECT o_custkey, o_orderkey,
       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)  AS moving_avg3,
       CAST(ntile(4) OVER w AS BIGINT)                      AS quartile,
       round(percent_rank() OVER w, 6)                      AS pct_rank,
       first_value(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
       last_value(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)  AS last_order
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string suite over part names."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 500)
        .select(
            "p_partkey",
            F.upper("p_name").alias("upper_name"),
            F.lower("p_brand").alias("lower_brand"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.length("p_name").cast("long").alias("name_len"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
            F.reverse(F.col("p_name")).alias("reversed_name"),
            F.translate("p_type", "AEIOU", "aeiou").alias("lowered_vowels"),
        )
        .orderBy("p_partkey")
    )


STRING_FUNCS_SQL = """
SELECT p_partkey,
       upper(p_name)                          AS upper_name,
       lower(p_brand)                         AS lower_brand,
       substring(p_name, 1, 5)                AS name_prefix,
       CAST(length(p_name) AS BIGINT)         AS name_len,
       concat_ws('/', p_brand, p_type)        AS brand_type,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       reverse(p_name)                        AS reversed_name,
       translate(p_type, 'AEIOU', 'aeiou')    AS lowered_vowels
FROM part
WHERE p_partkey < 500
ORDER BY p_partkey
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date/time suite over order dates."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
            F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
            F.datediff(
                F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
            ).cast("long").alias("days_to_2002"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
        )
        .orderBy("o_orderkey")
    )


DATE_FUNCS_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)     AS order_year,
       CAST(month(o_orderdate) AS BIGINT)    AS order_month,
       CAST(day(o_orderdate) AS BIGINT)      AS order_day,
       CAST(quarter(o_orderdate) AS BIGINT)  AS order_quarter,
       strftime(o_orderdate, '%Y-%m-%d')     AS order_date_str,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)
                                             AS days_to_2002,
       date_trunc('month', o_orderdate)      AS month_start
FROM orders
WHERE o_orderkey < 1000
ORDER BY o_orderkey
"""


def like_regex_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate varieties: LIKE, rlike, isin-on-strings, null-safe."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(
            F.col("p_name").like("%a%")
            & F.col("p_type").rlike("^[A-Z]+")
            & F.col("p_brand").isNotNull()
            & ~F.col("p_size").isin(0)
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .orderBy("p_brand")
    )


LIKE_REGEX_SQL = """
SELECT p_brand, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
FROM part
WHERE p_name LIKE '%a%'
  AND regexp_matches(p_type, '^[A-Z]+')
  AND p_brand IS NOT NULL
  AND p_size NOT IN (0)
GROUP BY p_brand
ORDER BY p_brand
"""


def percentiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90) per segment."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median_bal"),
            F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90_bal"),
            F.round(F.min("c_acctbal"), 4).alias("min_bal"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
        )
        .orderBy("c_mktsegment")
    )


PERCENTILES_SQL = """
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
       round(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal,
       round(min(c_acctbal), 4)                AS min_bal,
       round(max(c_acctbal), 4)                AS max_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


FUZZY_EDIT_MAX = 2
FUZZY_Q = 3
FUZZY_KEY_MAX = 500
# q-gram count-filter theorem: ed(a,b) <= d implies the names share at
# least max(|a|,|b|) - q + 1 - d*q q-grams. The bound is vacuous only
# when max(|a|,|b|) <= q - 1 + d*q, so pairs of strings that short must
# be checked directly — everything longer MUST collide on >= 1 q-gram.
_FUZZY_SHORT_LEN = FUZZY_Q - 1 + FUZZY_EDIT_MAX * FUZZY_Q


def fuzzy_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching, BLOCKED: candidate pairs come from
    a shared-3-gram join (plus the provably-required all-pairs fallback
    among strings too short for the count filter to bind), and
    levenshtein runs on candidates only — never on the full cross
    product. The blocking is lossless for the threshold (count-filter
    theorem above), so the exact all-pairs DuckDB oracle hash-matches.

    Scale shape: the gram join shuffles (gram, key) pairs; the short
    fallback is quadratic only in the count of sub-9-char strings.
    """
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < FUZZY_KEY_MAX)
        .select("p_partkey", "p_name")
    )
    grams = part.select(
        F.col("p_partkey").alias("k"),
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length(p_name) - {FUZZY_Q - 1}, 1)),"
                    f" i -> substring(p_name, i, {FUZZY_Q}))"
                )
            )
        ).alias("g"),
    )
    ga, gb = grams.alias("ga"), grams.alias("gb")
    cand_grams = (
        ga.join(
            gb,
            (F.col("ga.g") == F.col("gb.g"))
            & (F.col("ga.k") < F.col("gb.k")),
        )
        .select(F.col("ga.k").alias("key_a"), F.col("gb.k").alias("key_b"))
        .distinct()
    )
    short = part.filter(F.length("p_name") <= _FUZZY_SHORT_LEN)
    sa = short.select(F.col("p_partkey").alias("key_a"))
    sb = short.select(F.col("p_partkey").alias("key_b"))
    # no forced broadcast: the short-name subset scales with the part
    # table on real data — size/AQE decides (tiny here under the
    # constant FUZZY_KEY_MAX cap, so locally identical plan)
    cand_short = sa.join(sb, F.col("key_a") < F.col("key_b"))
    cands = cand_grams.union(cand_short).distinct()
    a = part.select(
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a")
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b")
    )
    return (
        cands.join(F.broadcast(a), "key_a")
        .join(F.broadcast(b), "key_b")
        .withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .filter(F.col("edit_dist") <= FUZZY_EDIT_MAX)
        .select("key_a", "key_b", "edit_dist")
        .orderBy("key_a", "key_b")
    )


FUZZY_SQL = f"""
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM part a JOIN part b ON a.p_partkey < b.p_partkey
WHERE a.p_partkey < {FUZZY_KEY_MAX} AND b.p_partkey < {FUZZY_KEY_MAX}
  AND levenshtein(a.p_name, b.p_name) <= {FUZZY_EDIT_MAX}
ORDER BY key_a, key_b
"""


def sql_entry_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql(...) surface over raw parquet paths — same
    Catalyst plan as the DataFrame API, exercised explicitly."""
    return spark.sql(f"""
        SELECT n.n_name AS nation_name,
               count(*) AS n_suppliers,
               CAST(sum(CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100 AS total_bal
        FROM parquet.`{sf_dir}/supplier.parquet` s
        JOIN parquet.`{sf_dir}/nation.parquet` n
          ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY nation_name
    """)


SQL_ENTRY_SQL = f"""
SELECT n_name AS nation_name,
       count(*) AS n_suppliers,
       {grid_sum_sql("s_acctbal", 2)} AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY nation_name
"""


QUERIES = {
    "window_frames": window_frames,
    "string_functions": string_functions,
    "date_functions": date_functions,
    "like_regex_filters": like_regex_filters,
    "percentiles_by_group": percentiles_by_group,
    "sql_entry_point": sql_entry_point,
    "fuzzy_part_pairs": fuzzy_part_pairs,
}

ORACLES = {
    "window_frames": WINDOW_FRAMES_SQL,
    "string_functions": STRING_FUNCS_SQL,
    "date_functions": DATE_FUNCS_SQL,
    "like_regex_filters": LIKE_REGEX_SQL,
    "percentiles_by_group": PERCENTILES_SQL,
    "sql_entry_point": SQL_ENTRY_SQL,
    "fuzzy_part_pairs": FUZZY_SQL,
}
