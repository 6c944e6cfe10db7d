"""Fifth relational batch: the ten remaining TPC-H query shapes
(Q2, Q4, Q8, Q9, Q11, Q12, Q13, Q16, Q20, Q21), adapted to the
testdata schema (no partsupp / l_commitdate / l_receiptdate /
l_shipmode — the part↔supplier relation is derived from lineitem and
the late-shipment predicates compare l_shipdate to o_orderdate). The
PLAN SHAPES are the TPC-H ones — correlated min-per-group join-back
(Q2), EXISTS semi-join with an inequality (Q4), two-level conditional
ratio over a 6-way join (Q8), multi-dim profit rollup (Q9), HAVING
vs a scalar global threshold (Q11), conditional bands after an
inequality join (Q12), left-outer count distribution (Q13),
count-distinct with NOT-IN exclusion (Q16), correlated-aggregate
threshold semi-join chain (Q20), and EXISTS/NOT-EXISTS self-joins
(Q21). Reference parity: the reference engine's single query
(repository/ParameterDataRepository.java:53-78) has none of these shapes;
SURVEY §2.3-§2.4 lists them as the relational completeness target.

Conventions as in plans/relational.py: grid_sum/exact_avg for
cross-engine-exact money aggregation; every output column aliased
identically in the Spark plan and the DuckDB oracle; every ORDER BY
that feeds a LIMIT is a total order (unique tiebreak) so both engines
pick the same rows.

Scale notes are per-query; dims (part 2k, supplier 100, nation 25 at
sf0.01 — still tiny at 100 TB where lineitem alone grows) broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import _REVENUE, exact_avg_sql, grid_sum, grid_sum_sql


def _li(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) in
    region EUROPE offering the minimum cost. partsupp does not exist
    in the testdata, so the part↔supplier cost relation is derived
    from lineitem: cost(part, supp) = min line price. The correlated
    min subquery decorrelates into a per-part aggregate joined back
    on exact equality (min of identical doubles — no arithmetic, so
    cross-engine exact).

    Scale: lineitem collapses to the (part, supp) grain in ONE
    partial-agg shuffle; everything after operates on dim-sized data.
    Supplier/nation/region broadcast."""
    li = _li(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eu_supp = (
        supp.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    cost = (
        li.join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    min_cost = cost.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        cost.join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "cost",
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_name")
        .limit(100)
    )


Q2_SQL = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
  FROM lineitem JOIN eu_supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
FROM cost
JOIN part ON l_partkey = p_partkey
JOIN eu_supp ON l_suppkey = s_suppkey
WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
  AND cost = (SELECT min(c2.cost) FROM cost c2
              WHERE c2.l_partkey = cost.l_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
"""


def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter where EXISTS a line shipped
    more than 30 days after the order date (the commit/receipt late
    predicate, adapted), counted per priority. Left-semi join carries
    the inequality alongside the equi key — Catalyst keeps the equi
    part hashable and evaluates the inequality as a join residual.

    Scale: both sides pre-filtered before the shuffle; the semi join
    never widens rows and the output grain is 5 rows."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _li(spark, sf_dir)
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_7's share of PROMO-part revenue sold to ASIA
    customers, by order year. Six-way join where every dim broadcasts
    and lineitem is the only fact; the share is a ratio of two exact
    integer grid sums divided once (cross-engine deterministic).

    Scale: nation joins twice (customer side and supplier side) under
    different aliases; only lineitem⋈orders shuffles."""
    li = _li(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cust_nat = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_nationkey"))
    supp_nat = nation.select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    rev_grid = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_nationkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("sn_nationkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", rev_grid).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum(rev_grid)
            ).alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
                     THEN CAST(floor(({_REVENUE}) * 10000 + 0.5) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
         / sum(CAST(floor(({_REVENUE}) * 10000 + 0.5) AS BIGINT)) AS mkt_share,
       count(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit by supplier nation and order year for parts
    named like '%widget%'. ps_supplycost does not exist, so cost is
    p_retailprice·l_quantity (same expression shape: revenue minus a
    part-attribute·quantity product; both terms sit on the 1e-4 grid,
    so one grid_sum of the difference is exact cross-engine).

    Scale: part filter broadcasts and prunes lineitem FIRST (the
    selective join), then one shuffle to (nation, year) grain."""
    li = _li(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            grid_sum(amount, 4).alias("sum_profit"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("nation_name", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation_name,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {grid_sum_sql(f"{_REVENUE} - p_retailprice * l_quantity", 4)} AS sum_profit,
       count(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation_name, o_year DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: per-part inventory value for NATION_7 suppliers,
    keeping parts whose value exceeds 1/700 of the global total
    (scalar-subquery HAVING). Both the per-part value and the global
    total stay EXACT INTEGERS (cent grid) until after the threshold
    comparison — ``700·value_i > total_i`` is integer arithmetic in
    both engines, so no boundary row can flip on float summation
    order (a double `sum(value)*0.01` threshold would be
    order-dependent).

    Scale: the per-part aggregate is one shuffle; the global total is
    a one-row broadcast — no second pass over lineitem."""
    li = _li(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    nat_li = li.join(
        F.broadcast(
            supp.join(
                F.broadcast(nation),
                F.col("s_nationkey") == F.col("n_nationkey"),
            ).select("s_suppkey")
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    per_part = nat_li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * F.col("l_quantity") * 100 + F.lit(0.5)
            ).cast("long")
        ).alias("value_i")
    )
    total = per_part.agg(F.sum("value_i").alias("total_i"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_i") * 700 > F.col("total_i"))
        .select(
            "l_partkey", (F.col("value_i") / F.lit(100.0)).alias("value")
        )
        .orderBy(F.desc("value"), "l_partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(floor(l_extendedprice * l_quantity * 100 + 0.5) AS BIGINT))
           AS value_i
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey, value_i / 100.0 AS value
FROM per_part
WHERE value_i * 700 > (SELECT sum(value_i) FROM per_part)
ORDER BY value DESC, l_partkey
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: lines shipped more than 45 days after their
    order date (the commit<receipt late predicate, adapted), banded
    into high/low priority counts per l_returnflag (the shipmode
    stand-in — the only other low-cardinality lineitem attribute).

    Scale: the inequality rides the equi orderkey join; conditional
    sums partial-aggregate map-side to a 3-row result."""
    li = _li(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("flag")
    )


Q12_SQL = """
SELECT l_returnflag AS flag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
GROUP BY l_returnflag
ORDER BY flag
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the distribution of per-customer order counts,
    including zero-order customers — the left-outer-join-then-
    double-aggregate shape. The order-side filter (priority, standing
    in for the comment NOT LIKE) must sit in the JOIN CONDITION, not
    a WHERE, to preserve the outer semantics.

    Scale: first aggregate collapses to customer grain (one shuffle),
    second to count grain (tiny)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier counts per (brand, type, size)
    for qualifying parts, excluding blacklisted suppliers (negative
    account balance — the complaints stand-in), via the lineitem-
    derived part↔supplier relation. Anti join for the NOT IN (the
    exclusion set is null-free by construction).

    Scale: lineitem collapses to distinct (part, supp) pairs FIRST
    (one shuffle on the pair), then count-distinct at the attribute
    grain; the exclusion set broadcasts."""
    li = _li(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        pairs.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers shipping an outsized share of a
    part's volume in 1996 — the correlated-aggregate threshold
    (availqty > ½·shipped, adapted to share-of-part > 50%, the real Q20's
    half-of-shipped threshold (selective: 1996 'gear' volume per part
    concentrates on few suppliers)) feeding a semi-join back to
    the supplier dim, restricted to 'gear' parts.

    Scale: quantities aggregate to (part, supp) then part grain
    before any comparison; the qualifying supplier id set is tiny and
    drives a broadcast semi join."""
    li = _li(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    y96 = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    per_ps = y96.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    per_p = per_ps.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        per_ps.join(per_p, F.col("l_partkey") == F.col("pp_partkey"))
        .filter(F.col("supp_qty") > F.lit(0.5) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(
            F.broadcast(dominant),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%gear%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
per_p AS (
  SELECT l_partkey AS pp_partkey, sum(supp_qty) AS part_qty
  FROM per_ps GROUP BY l_partkey
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_ps JOIN per_p ON l_partkey = pp_partkey
  WHERE supp_qty > 0.5 * part_qty)
ORDER BY s_suppkey
"""


def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers whose line was the STRICT last
    shipment in a multi-supplier finished order — EXISTS (another
    supplier participated) plus NOT EXISTS (another supplier shipped
    at-or-after me), adapted from the commit/receipt predicate to
    l_shipdate. Counted per supplier (numwait), top 100.

    Scale: both self-joins are equi on l_orderkey (sort-merge
    friendly, same key as the base relation — one shuffle partitioning
    reused across all three legs); the supplier dim broadcasts."""
    li = _li(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    l1 = li.join(
        orders.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
        F.col("l_shipdate").alias("o3_shipdate"),
    )
    waiting = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey"))
        & (F.col("o3_shipdate") >= F.col("l_shipdate")),
        "left_anti",
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate >= l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_order_priority_check": q4_order_priority_check,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q13_customer_distribution": q13_customer_distribution,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_dominant_suppliers": q20_dominant_suppliers,
    "q21_waiting_orders": q21_waiting_orders,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q4_order_priority_check": Q4_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_stock": Q11_SQL,
    "q12_shipmode_priority": Q12_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q20_dominant_suppliers": Q20_SQL,
    "q21_waiting_orders": Q21_SQL,
}
