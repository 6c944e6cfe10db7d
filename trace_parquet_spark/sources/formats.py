"""CSV / JSON / ORC read-write parity under the oracle gate.

SURVEY §2.1 S8 lists the file formats the reference lacks (its only
output is one in-memory Parquet file,
reference: service/ParquetConversionService.java:60-96); this module
makes the remaining built-in formats registry-visible the same way
federated_source_union did for the parquet/gzjsonl/tablelog
connectors: one query writes disjoint residue-class slices of orders
to csv, json, and orc, reads each back through the matching reader,
unions them with per-format lineage, and aggregates. The DuckDB
oracle recomputes everything from the parquet orders table alone, so
agreement proves each format round-trips values (bigint, string,
date) byte-exactly — not merely that the writers ran.

Scale notes: each write is a normal distributed job (no coalesce);
reads carry explicit schemas so CSV/JSON never fall into
schema-inference scans; the final aggregate is format-grain (3 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_SLICE_SCHEMA = (
    "o_orderkey long, cents long, o_orderstatus string, o_orderdate date"
)
_FORMATS = ("csv", "json", "orc")


def multi_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders slices to csv+json+orc, read back, union, and
    aggregate per format (count / exact cents sum / key span / min
    date). doc of record: o_orderkey % 3 picks the format, so every
    row of the shared slice flows through exactly one codec and the
    totals reconcile against the parquet source of truth."""
    import shutil
    import tempfile

    orders = (
        load_table(spark, sf_dir, "orders")
        # the shared deterministic 25% slice (tablelog convention):
        # format-parity is a mechanism check, not a scan benchmark
        .filter((F.col("o_orderkey") % 8).isin(0, 5))
        .select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            "o_orderstatus",
            F.to_date("o_orderdate").alias("o_orderdate"),
        )
    )
    work = tempfile.mkdtemp(prefix="formats_")
    try:
        parts = []
        for i, fmt in enumerate(_FORMATS):
            path = f"{work}/{fmt}"
            sl = orders.filter(F.col("o_orderkey") % 3 == i)
            w = sl.write.mode("overwrite")
            if fmt == "csv":
                w = w.option("header", "true")
            w.format(fmt).save(path)
            r = spark.read.schema(_SLICE_SCHEMA)
            if fmt == "csv":
                r = r.option("header", "true")
            parts.append(
                r.format(fmt)
                .load(path)
                .select(F.lit(fmt).alias("format"), "*")
            )
        out = (
            parts[0]
            .unionByName(parts[1])
            .unionByName(parts[2])
            .groupBy("format")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("total_cents"),
                F.min("o_orderkey").cast("long").alias("min_key"),
                F.max("o_orderkey").cast("long").alias("max_key"),
                F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias(
                    "min_date"
                ),
                F.count_distinct("o_orderstatus")
                .cast("long")
                .alias("n_status"),
            )
            .orderBy("format")
        )
        rows = out.collect()  # materialize before the scratch dir goes
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "format string, n_rows long, total_cents long, min_key long, "
        "max_key long, min_date string, n_status long",
    ).orderBy("format")


MULTI_FORMAT_SQL = """
WITH o AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderstatus,
         CAST(o_orderdate AS DATE) AS o_orderdate,
         CASE CAST(o_orderkey % 3 AS INT)
           WHEN 0 THEN 'csv' WHEN 1 THEN 'json' ELSE 'orc' END AS format
  FROM orders WHERE o_orderkey % 8 IN (0, 5)
)
SELECT format,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key,
       CAST(min(o_orderdate) AS VARCHAR) AS min_date,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status
FROM o
GROUP BY format
ORDER BY format
"""

QUERIES["multi_format_roundtrip"] = multi_format_roundtrip
ORACLES["multi_format_roundtrip"] = MULTI_FORMAT_SQL
