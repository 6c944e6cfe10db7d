"""Custom connector via the Python DataSource API (new in Spark 4):
a gzip-compressed JSON-lines trace source with per-file partitioning
and genuine filter pushdown into the Python reader.

This is the engine-extension seam the reference lacks entirely (its
source is a hardwired R2DBC query — SURVEY §2.1 S1): any bespoke
format — proprietary trace dumps, vendor telemetry, an internal RPC —
plugs into Catalyst through exactly this class shape, and the scan
parallelizes like any other source (one InputPartition per file; a
1000-executor cluster reads 1000 files concurrently).

Pushdown: pushFilters accepts EqualTo/In on param_index and applies
them INSIDE the reader — rows are dropped at the gzip-decode loop,
before Arrow serialization, which is where a remote source would turn
them into a server-side predicate. Unsupported filters are returned to
Spark, which re-applies them after the scan (the API's contract, so
correctness never depends on the source's pushdown coverage).
"""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "trace_id bigint, param_index int, payload string"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class GzJsonlReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("gzjsonl requires option 'path'")
        self.allowed_params: set | None = None

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("param_index",):
                self.allowed_params = {f.value}
            elif isinstance(f, In) and f.attribute == ("param_index",):
                self.allowed_params = set(f.values)
            else:
                yield f  # not ours — Spark re-applies it post-scan

    def partitions(self):
        return [
            _FilePartition(os.path.join(self.dir, n))
            for n in sorted(os.listdir(self.dir))
            if n.endswith(".jsonl.gz")
        ]

    def read(self, partition: _FilePartition):
        allowed = self.allowed_params
        with gzip.open(partition.path, "rt", encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if allowed is not None and rec["param_index"] not in allowed:
                    continue
                yield rec["trace_id"], rec["param_index"], rec["payload"]


class GzJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gzjsonl"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return GzJsonlReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(GzJsonlDataSource)
