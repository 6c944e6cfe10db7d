"""VARIANT-typed semi-structured access (new in Spark 4): parse_json
into the binary VARIANT encoding, then typed variant_get extraction —
the modern replacement for string-launched json_extract on every
access. The reference has no semi-structured columns at all; this
extends SURVEY §2.8 alongside json_extract_events (string JSON path)
and json_permissive_parse.

Scale: VARIANT parses each JSON document ONCE into a binary form that
downstream extractions navigate without re-parsing — at 100 TB the
difference between one parse per document and one per (document ×
field). The DuckDB oracle uses its native JSON extraction; both
engines see the same source text, so typed outputs are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table


def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    staged = ev.select("event_id", v.alias("v"))
    return staged.select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k_big"),
        F.expr("variant_get(v, '$.k', 'double')").alias("k_dbl"),
        F.expr("variant_get(v, '$.missing', 'string')").alias("absent"),
        F.expr("variant_get(v, '$.k', 'string')").alias("k_str"),
    ).orderBy("event_id")


VARIANT_PROPS_SQL = """
SELECT event_id,
       CAST(props->>'$.k' AS BIGINT)  AS k_big,
       CAST(props->>'$.k' AS DOUBLE)  AS k_dbl,
       props->>'$.missing'            AS absent,
       props->>'$.k'                  AS k_str
FROM events
ORDER BY event_id
"""


QUERIES = {"variant_props_extract": variant_props_extract}
ORACLES = {"variant_props_extract": VARIANT_PROPS_SQL}
