"""Change-data-capture shapes: SCD type-2 history build and
latest-version CDC apply.

The reference engine is read-only over an immutable trace table
(repository/ParameterDataRepository.java:53-78 — no update semantics anywhere);
these are the standard warehouse maintenance operators a pipeline using
this engine needs next to MERGE (operators/merge.py).

Both are pure window/aggregate compositions — no iterative driver
logic, no Python — so they inherit Spark's shuffle-once-on-key plan:

- ``scd2_user_event_type`` turns an append-only event stream into a
  type-2 dimension: one row per (user, consecutive run of equal
  event_type), with [valid_from, valid_to) intervals and a version
  number. Change points come from lag(); interval ends from lead()
  OVER the change points only — i.e. two linear passes over each
  user's partition, never a self-join.
- ``cdc_apply_latest`` replays a keyed change stream (op column:
  upsert/delete) and materializes the final table state: the
  max-version row per key wins, deletes drop the key. row_number desc
  + rn=1 compiles to a single shuffle on the key with per-partition
  top-1 (no global sort).

Scale: both shuffle once on user_id and stream within partitions;
state is O(1) per row (lag/lead) or the single current-best row
(row_number). Valid at any corpus size where a single user's history
fits a partition — the same assumption every SQL window makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table


def scd2_user_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history of each user's event_type attribute: consecutive
    equal values collapse into one validity interval."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn(
        "prev_type", F.lag("event_type").over(worder)
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    wchg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(wchg).alias("valid_to"),
            F.row_number().over(wchg).cast("long").alias("version"),
            F.lead("ts").over(wchg).isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


SCD2_SQL = """
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events
), changes AS (
  SELECT *
  FROM (
    SELECT user_id, event_id, ts, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
    FROM ev
  )
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id,
       event_type,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       row_number() OVER w AS version,
       lead(ts) OVER w IS NULL AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version
"""


# A change stream derived deterministically from events: every event
# upserts the user's (value, ts); an 'error' event is a tombstone.
DELETE_TYPE = "error"


def cdc_apply_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the keyed change stream and return final table state:
    highest-(ts, event_id) change per user wins; a winning tombstone
    removes the key from the result."""
    ev = load_table(spark, sf_dir, "events")
    ch = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == DELETE_TYPE, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    wdesc = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ch.withColumn("rn", F.row_number().over(wdesc))
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select(
            "user_id",
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
            F.col("event_id").alias("last_event_id"),
        )
        .orderBy("user_id")
    )


CDC_APPLY_SQL = f"""
WITH ch AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         CASE WHEN event_type = '{DELETE_TYPE}' THEN 'D' ELSE 'U' END AS op
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM ch
)
SELECT user_id,
       value    AS last_value,
       ts       AS last_ts,
       event_id AS last_event_id
FROM ranked
WHERE rn = 1 AND op = 'U'
ORDER BY user_id
"""


def scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join of facts against the SCD2 dimension: every
    purchase picks up the dimension attribute (event_type run) and
    version that were valid AT its timestamp — the leakage-free
    dimension lookup every feature pipeline needs next to
    pit_features_7d.

    NOT a range join: facts ⋈ intervals ON ts BETWEEN valid_from AND
    valid_to is a quadratic blowup risk and Spark plans it as
    BroadcastNestedLoop at scale. Instead the change points and the
    facts are UNIONED into one per-user stream ordered by
    (ts, kind, event_id) — changes sort before facts at the same
    instant, matching the oracle's half-open [valid_from, valid_to)
    interval semantics (a change taking effect at t covers a fact at
    t; of several changes at the same t the last by event_id wins,
    exactly the interval the BETWEEN replay assigns since the earlier
    ones collapse to empty [t, t) intervals) — and
    last(dim, ignoreNulls) carries the current dimension image onto
    each fact row. Two window passes over the same user_id
    partitioning (version numbering, then the carry), zero self-joins.

    The oracle replays it as the literal interval join over the
    SCD2_SQL dimension — a genuinely different derivation (build
    intervals, BETWEEN-join) that must agree row-for-row.

    Scale: one shuffle on user_id; the union stream is |changes| +
    |facts| rows; state per row is the single carried struct. Valid
    wherever a user's history fits a partition — the standard window
    assumption."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(worder))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .withColumn("version", F.row_number().over(worder).cast("long"))
    )
    ch = changes.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("kind"),
        F.struct(
            F.col("event_type").alias("dt"), F.col("version").alias("dv")
        ).alias("dim"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None)
        .cast("struct<dt:string,dv:long>")
        .alias("dim"),
    )
    wcarry = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ch.unionByName(facts)
        .withColumn("d", F.last("dim", ignorenulls=True).over(wcarry))
        .filter(F.col("kind") == 1)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.col("d.dt").alias("dim_event_type"),
            F.col("d.dv").alias("dim_version"),
        )
        .orderBy("user_id", "event_id")
    )


SCD2_PIT_SQL = """
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events
), changes AS (
  SELECT *
  FROM (
    SELECT user_id, event_id, ts, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
    FROM ev
  )
  WHERE prev_type IS NULL OR prev_type <> event_type
), scd AS (
  SELECT user_id,
         event_type,
         ts AS valid_from,
         lead(ts) OVER w AS valid_to,
         row_number() OVER w AS version
  FROM changes
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), p AS (
  SELECT user_id, event_id, ts FROM ev WHERE event_type = 'purchase'
)
SELECT p.user_id, p.event_id, p.ts,
       s.event_type AS dim_event_type,
       CAST(s.version AS BIGINT) AS dim_version
FROM p
JOIN scd s
  ON s.user_id = p.user_id
 AND p.ts >= s.valid_from
 AND (s.valid_to IS NULL OR p.ts < s.valid_to)
ORDER BY p.user_id, p.event_id
"""


QUERIES = {
    "scd2_user_event_type": scd2_user_event_type,
    "cdc_apply_latest": cdc_apply_latest,
    "scd2_pit_join": scd2_pit_join,
}

ORACLES = {
    "scd2_user_event_type": SCD2_SQL,
    "cdc_apply_latest": CDC_APPLY_SQL,
    "scd2_pit_join": SCD2_PIT_SQL,
}
