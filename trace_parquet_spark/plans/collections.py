"""Collection-typed column operators: map construction/inspection and
array/vector math via higher-order functions (transform / zip_with /
aggregate / map_from_entries / map_filter).

The reference engine has no collection types at all (its one query is
flat columns — repository/ParameterDataRepository.java:53-78); SURVEY §2.8 lists
array/map scalar functions as part of the completeness target. Maps are
unordered in both engines, so every driver-facing output serializes
entries in sorted key order ('k:v|k:v') — the same rule the round-1
verdict prescribed for collect_aggregates (arrays are unhashable in the
driver canonicalizer).

Cross-engine exactness: all vector math is done on an integer grid —
each float component is quantized once with floor(x·1e6 + 0.5) (the
float→double conversion is exact, so both engines quantize to the same
BIGINT), every sum/product stays in exact integer arithmetic, and any
double-valued output is derived from those integers in ONE identical
expression (sqrt of an exact-int ratio), which IEEE 754 makes
bit-identical.

Scale notes: both queries are single-pass projections / one partial-agg
shuffle on the grouping key; higher-order functions run inside
whole-stage codegen (no Python). The quantized vector is STAGED in its
own projection (referenced >1×, so CollapseProject keeps it — the
measured text_stats pattern from PERF.md) instead of being re-derived
per output column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

HOT_TYPE_MIN = 25  # a type is "hot" for a user at >= this many events


def map_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user map<event_type, count> built with map_from_entries over
    a sorted entry array, then inspected with map_keys / map_values /
    map_entries / map_filter — the §2.8 map-function surface in one
    query. Serialized deterministically for the driver gate.

    Scale: two partial-agg shuffles, both on keys the data is already
    skew-free on (user_id ~uniform); the map per user is bounded by the
    5-value event_type domain, so map cells never grow with data size.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    entry_str = F.transform(
        F.map_entries("m"),
        lambda e: F.concat(e["key"], F.lit(":"), e["value"].cast("string")),
    )
    return (
        m.select(
            "user_id",
            F.size("m").cast("long").alias("n_types"),
            F.array_join(entry_str, "|").alias("type_counts"),
            F.array_join(
                F.map_keys(
                    F.map_filter("m", lambda k, v: v >= F.lit(HOT_TYPE_MIN))
                ),
                "|",
            ).alias("hot_types"),
            F.aggregate(
                F.map_values("m"),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("n_events"),
        )
        .orderBy("user_id")
    )


MAP_EVENT_TYPE_COUNTS_SQL = f"""
WITH per AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(count(*) AS BIGINT)                                AS n_types,
       string_agg(event_type || ':' || cnt, '|' ORDER BY event_type)
                                                               AS type_counts,
       COALESCE(string_agg(CASE WHEN cnt >= {HOT_TYPE_MIN} THEN event_type END,
                           '|' ORDER BY event_type), '')       AS hot_types,
       CAST(sum(cnt) AS BIGINT)                                AS n_events
FROM per
GROUP BY user_id
ORDER BY user_id
"""


def vector_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions as vector math over the embedding
    column: quantize once (transform), then norms (transform+aggregate),
    a zip_with dot product against the reversed vector, and array
    min/max — all exact integer arithmetic; the only double output is
    sqrt(norm2/1e12), a single identical expression in both engines.

    Scale: pure narrow projection — no shuffle at all except the final
    presentation sort; per-row cost is O(dim) inside codegen.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    staged = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(1e6) + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("q"),
    )
    norm2 = F.aggregate(
        F.transform("q", lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return staged.select(
        "vec_id",
        F.size("q").cast("long").alias("dim"),
        norm2.alias("norm2_q"),
        F.sqrt(norm2 / F.lit(1e12)).alias("l2_norm"),
        F.aggregate(
            F.transform("q", F.abs),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("l1_q"),
        F.aggregate(
            F.zip_with("q", F.reverse(F.col("q")), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot_rev_q"),
        F.array_max("q").alias("max_q"),
        F.array_min("q").alias("min_q"),
    ).orderBy("vec_id")


# DuckDB: same quantization lambda; the reversed dot product is written
# positionally (q[i+1] * q[n-i], 1-based lists) because multiplication
# inside exact integers makes evaluation order irrelevant.
VECTOR_MATH_SQL = """
WITH staged AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
           AS q
  FROM embeddings
)
SELECT vec_id,
       CAST(len(q) AS BIGINT)                                      AS dim,
       CAST(list_aggregate(list_transform(q, x -> x * x), 'sum') AS BIGINT)
                                                                   AS norm2_q,
       sqrt(CAST(list_aggregate(list_transform(q, x -> x * x), 'sum')
                 AS DOUBLE) / 1e12)                                AS l2_norm,
       CAST(list_aggregate(list_transform(q, x -> abs(x)), 'sum') AS BIGINT)
                                                                   AS l1_q,
       CAST(list_aggregate(
             list_transform(range(len(q)), i -> q[i + 1] * q[len(q) - i]),
             'sum') AS BIGINT)                                     AS dot_rev_q,
       CAST(list_aggregate(q, 'max') AS BIGINT)                    AS max_q,
       CAST(list_aggregate(q, 'min') AS BIGINT)                    AS min_q
FROM staged
ORDER BY vec_id
"""


def regexp_extract_all_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all over the semi-structured props column: all
    digit runs per event as an array (serialized), their count, and the
    first one as a number (null-safe get).

    Scale: narrow per-row projection, regex runs inside codegen; no
    shuffle but the presentation sort.
    """
    ev = load_table(spark, sf_dir, "events")
    staged = ev.select(
        "event_id",
        F.regexp_extract_all("props", F.lit(r"\d+"), 0).alias("nums"),
    )
    return staged.select(
        "event_id",
        F.array_join("nums", "|").alias("num_list"),
        F.size("nums").cast("long").alias("n_nums"),
        F.get("nums", 0).cast("long").alias("first_num"),
    ).orderBy("event_id")


REGEXP_EXTRACT_SQL = r"""
WITH staged AS (
  SELECT event_id, regexp_extract_all(props, '\d+') AS nums
  FROM events
)
SELECT event_id,
       array_to_string(nums, '|')   AS num_list,
       CAST(len(nums) AS BIGINT)    AS n_nums,
       CAST(nums[1] AS BIGINT)      AS first_num
FROM staged
ORDER BY event_id
"""


QUERIES = {
    "map_event_type_counts": map_event_type_counts,
    "vector_math_suite": vector_math_suite,
    "regexp_extract_all_props": regexp_extract_all_props,
}

ORACLES = {
    "map_event_type_counts": MAP_EVENT_TYPE_COUNTS_SQL,
    "vector_math_suite": VECTOR_MATH_SQL,
    "regexp_extract_all_props": REGEXP_EXTRACT_SQL,
}
