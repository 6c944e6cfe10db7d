"""Event-sequence analytics: regex pattern matching over per-user
paths (the MATCH_RECOGNIZE workload, expressed as collect-sort-concat
+ RLIKE since Spark has no MATCH_RECOGNIZE clause) and the first-order
Markov transition matrix between event types.

Determinism: event timestamps can collide (the source grid is
nanoseconds but ties still occur), so every ordering is (ts, event_id)
— the composite is unique. Paths are built from single-char symbols
(the event types' distinct initials), keeping the per-user string
bounded and the regex engine-portable (plain '.'/'*' syntax — Java
regex and DuckDB's RE2 agree). Transition probabilities are ONE
division of two exactly-representable integers — bit-identical across
IEEE engines.

Scale: both queries are one shuffle on user_id. Path building is a
groupBy collect over each user's own events (bounded by per-user
activity, the natural partition unit); the transition matrix uses a
lead() window inside the same partitioning then aggregates the tiny
(types × types) relation. No cross-user data movement beyond the
initial hash partition.

Reference: no counterpart (single-query engine; reference README.md
query surface is one filtered export). North-star product-analytics
surface alongside funnel_conversion/sessionize_events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table

# view ... click ... purchase, anywhere in the stream, in order
PATH_PATTERN = "v.*c.*p"


def _paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("sym")
    )
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "sym"))),
        lambda s: s["sym"],
    )
    return ev.groupBy("user_id").agg(
        F.array_join(ordered, "").alias("path"),
        F.count("*").cast("long").alias("n_events"),
    )


def path_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users whose event path contains a view→click→purchase
    subsequence (regex over the symbol string)."""
    return (
        _paths(spark, sf_dir)
        .filter(F.col("path").rlike(PATH_PATTERN))
        .select("user_id", "n_events", "path")
        .orderBy("user_id")
    )


PATH_PATTERN_SQL = f"""
WITH paths AS (
  SELECT user_id,
         string_agg(substring(event_type, 1, 1), ''
                    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS path,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events
  GROUP BY user_id
)
SELECT user_id, n_events, path
FROM paths
WHERE regexp_matches(path, '{PATH_PATTERN}')
ORDER BY user_id
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions: count and probability of each
    (event_type → next event_type) step within a user's stream."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    ).filter(F.col("dst_type").isNotNull())
    counts = steps.groupBy("src_type", "dst_type").agg(
        F.count("*").alias("n")
    )
    outtot = counts.groupBy("src_type").agg(F.sum("n").alias("tot"))
    return (
        counts.join(outtot, "src_type")
        .select(
            "src_type",
            "dst_type",
            F.col("n").cast("long").alias("n"),
            (F.col("n").cast("double") / F.col("tot").cast("double")).alias("p"),
        )
        .orderBy("src_type", "dst_type")
    )


TRANSITION_SQL = """
WITH steps AS (
  SELECT event_type AS src_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
         ) AS dst_type
  FROM events
), counts AS (
  SELECT src_type, dst_type, count(*) AS n
  FROM steps WHERE dst_type IS NOT NULL
  GROUP BY src_type, dst_type
), outtot AS (
  SELECT src_type, CAST(sum(n) AS BIGINT) AS tot FROM counts GROUP BY src_type
)
SELECT c.src_type, c.dst_type,
       CAST(c.n AS BIGINT) AS n,
       CAST(c.n AS DOUBLE) / CAST(o.tot AS DOUBLE) AS p
FROM counts c JOIN outtot o ON c.src_type = o.src_type
ORDER BY c.src_type, c.dst_type
"""


QUERIES = {
    "path_pattern_match": path_pattern_match,
    "event_transition_matrix": event_transition_matrix,
}

ORACLES = {
    "path_pattern_match": PATH_PATTERN_SQL,
    "event_transition_matrix": TRANSITION_SQL,
}


def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity streaks — the gaps-and-islands shape: a
    user's distinct active days split into runs of CONSECUTIVE dates
    via the classic daynum − row_number island key (constant within a
    run, jumps at every gap). Emits per user the engagement summary a
    retention dashboard wants: active days, number of streaks, the
    longest streak and when it started (ties → earliest).

    Scale: one shuffle partitions distinct (user, day) rows by user;
    the rank window, the island aggregation, and the final per-user
    argmax all ride that partitioning (users independent — no global
    anything). Day numbers are exact integers (datediff vs epoch), so
    the island key needs no date arithmetic parity care."""
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
                "dn"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("dn")
    islands = (
        days.withColumn("isl", F.col("dn") - F.row_number().over(w))
        .groupBy("user_id", "isl")
        .agg(
            F.count("*").alias("streak_len"),
            F.min("dn").alias("start_dn"),
        )
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.desc("streak_len"), F.asc("start_dn")
    )
    return (
        islands.withColumn("rn", F.row_number().over(pick))
        .groupBy("user_id")
        .agg(
            F.sum("streak_len").cast("long").alias("n_active_days"),
            F.count("*").cast("long").alias("n_streaks"),
            F.max(F.when(F.col("rn") == 1, F.col("streak_len"))).cast("long").alias(
                "longest_streak"
            ),
            F.date_add(
                F.lit("1970-01-01").cast("date"),
                F.max(F.when(F.col("rn") == 1, F.col("start_dn"))).cast("int"),
            ).cast("timestamp").alias("longest_streak_start"),
        )
        .orderBy("user_id")
    )


ACTIVITY_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS dn
  FROM events
), keyed AS (
  SELECT user_id, dn,
         dn - row_number() OVER (PARTITION BY user_id ORDER BY dn) AS isl
  FROM days
), islands AS (
  SELECT user_id, isl,
         CAST(count(*) AS BIGINT) AS streak_len,
         min(dn) AS start_dn
  FROM keyed GROUP BY user_id, isl
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY streak_len DESC, start_dn) AS rn
  FROM islands
)
SELECT user_id,
       CAST(sum(streak_len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(CASE WHEN rn = 1 THEN streak_len END) AS BIGINT)
         AS longest_streak,
       CAST(DATE '1970-01-01'
         + to_days(CAST(max(CASE WHEN rn = 1 THEN start_dn END) AS INT))
         AS TIMESTAMP) AS longest_streak_start
FROM ranked
GROUP BY user_id
ORDER BY user_id
"""

QUERIES["activity_streaks"] = activity_streaks
ORACLES["activity_streaks"] = ACTIVITY_STREAKS_SQL


TRIGRAM_MIN_SUPPORT = 5


def event_trigrams_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent behavioral trigrams: consecutive event-type triples
    inside each user's time-ordered stream, kept at support ≥ 5 —
    the order-3 extension of event_transition_matrix's Markov pairs
    (funnel designers read these as observed paths, not hypothesized
    ones). Each triple also reports its share of all trigrams in ppm.

    Scale: one user_id partitioning carries the two lead windows
    (lead is frame-free — no buffering beyond two rows); the count
    aggregation reuses the exchange grain (type-triple cardinality
    is tiny). Determinism: ties in ts break on event_id, the house
    total order."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .where(F.col("e3").isNotNull())
    )
    counts = tri.groupBy("e1", "e2", "e3").agg(F.count("*").alias("support"))
    # the denominator is the pre-HAVING support sum — a window over
    # the tiny type-triple grid, not a second window pass over events
    wall = Window.partitionBy()
    return (
        counts.withColumn("n_tri", F.sum("support").over(wall))
        .where(F.col("support") >= TRIGRAM_MIN_SUPPORT)
        .select(
            "e1",
            "e2",
            "e3",
            "support",
            F.expr("CAST(support * 1000000 DIV n_tri AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy(F.desc("support"), "e1", "e2", "e3")
    )


TRIGRAMS_SQL = f"""
WITH tri AS (
  SELECT user_id,
         event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), t AS (
  SELECT * FROM tri WHERE e3 IS NOT NULL
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_tri FROM t)
SELECT e1, e2, e3,
       CAST(count(*) AS BIGINT) AS support,
       CAST(count(*) * 1000000 // (SELECT n_tri FROM n) AS BIGINT)
         AS share_ppm
FROM t
GROUP BY e1, e2, e3
HAVING count(*) >= {TRIGRAM_MIN_SUPPORT}
ORDER BY support DESC, e1, e2, e3
"""

QUERIES["event_trigrams_frequent"] = event_trigrams_frequent
ORACLES["event_trigrams_frequent"] = TRIGRAMS_SQL
