"""Zone maps for non-partitioned parquet: a per-file min/max manifest
built from parquet FOOTER statistics (no data read), used to prune the
file list before Spark ever plans the scan.

Hive-style partition dirs (sources/files, tests/test_partition_sources)
prune on the partition column only; a zone map prunes on any column the
data happens to be clustered by — the poor-man's Delta/Iceberg
data-skipping index, and the reason write_partitioned_sorted range-
partitions its output: tight per-file ranges are what make zone maps
selective.

Build cost is one footer read per file (metadata-only; here a driver
loop — at real scale distribute it with a mapInPandas over the file
list, same stats API). Query cost: manifest filter (tiny) + a scan
planned over only the surviving files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def build_zone_map(data_path: str, column: str) -> list[dict]:
    """Per-file [min, max, rows] for ``column`` from footer stats."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(data_path)):
        if not name.endswith(".parquet"):
            continue
        fpath = os.path.join(data_path, name)
        md = pq.ParquetFile(fpath).metadata
        idx = md.schema.names.index(column)
        lo = hi = None
        rows = 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
            rows += md.row_group(rg).num_rows
        out.append({"file": fpath, "min": lo, "max": hi, "rows": rows})
    return out


def pruned_read(
    spark: SparkSession,
    zone_map: list[dict],
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Scan only files whose [min, max] overlaps [lo, hi]. Files with
    missing stats are always read (can't prove them irrelevant).
    Returns (df, files_scanned, files_total); the caller still applies
    the row-level filter — zone maps prune FILES, not rows."""
    keep = [
        z["file"]
        for z in zone_map
        if z["min"] is None or not (z["max"] < lo or z["min"] > hi)
    ]
    if not keep:
        raise ValueError("zone map pruned every file; nothing to read")
    return spark.read.parquet(*keep), len(keep), len(zone_map)
