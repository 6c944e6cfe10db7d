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
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "trace_id bigint, param_index int, payload string"


def _schema_struct() -> StructType:
    # built programmatically, NOT via fromDDL: read() runs in the
    # executor's Python worker where no JVM/SparkSession exists to
    # parse DDL
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
    )

    return StructType(
        [
            StructField("trace_id", LongType()),
            StructField("param_index", IntegerType()),
            StructField("payload", StringType()),
        ]
    )


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
                s = {f.value}
            elif isinstance(f, In) and f.attribute == ("param_index",):
                s = set(f.value)  # In.value is the tuple of list values
            else:
                yield f  # not ours — Spark re-applies it post-scan
                continue
            # Conjunctions can push more than one param_index filter;
            # every consumed filter must hold, so intersect (never
            # overwrite — Spark won't re-apply a consumed filter).
            self.allowed_params = (
                s if self.allowed_params is None else self.allowed_params & s
            )

    def partitions(self):
        return [
            _FilePartition(os.path.join(self.dir, n))
            for n in sorted(os.listdir(self.dir))
            if n.endswith(".jsonl.gz")
        ]

    def read(self, partition: _FilePartition):
        # Arrow-vectorized: the parse loop stays Python (it's a text
        # format) but rows ship to the JVM as RecordBatches, not
        # per-row pickled tuples (sources/arrowio.py)
        from .arrowio import tuples_to_batches

        def rows():
            allowed = self.allowed_params
            with gzip.open(partition.path, "rt", encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    if (
                        allowed is not None
                        and rec["param_index"] not in allowed
                    ):
                        continue
                    yield rec["trace_id"], rec["param_index"], rec["payload"]

        yield from tuples_to_batches(rows(), _schema_struct())


class GzJsonlStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: tails the shard directory, offset = the
    sorted list of files already delivered. Each micro-batch emits the
    rows of files that appeared since the last offset — the shape of
    any log-tailing connector (Kafka stands behind a jar this image
    lacks; this is the same offset/commit contract in pure Python,
    checkpointable and replayable via readBetweenOffsets)."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("gzjsonl requires option 'path'")

    def _files(self) -> list[str]:
        return sorted(
            n for n in os.listdir(self.dir) if n.endswith(".jsonl.gz")
        )

    def _rows(self, names):
        for name in names:
            with gzip.open(
                os.path.join(self.dir, name), "rt", encoding="utf-8"
            ) as fh:
                for line in fh:
                    if line.strip():
                        rec = json.loads(line)
                        yield (
                            rec["trace_id"],
                            rec["param_index"],
                            rec["payload"],
                        )

    def initialOffset(self) -> dict:
        return {"seen": []}

    def read(self, start: dict):
        now = self._files()
        fresh = [n for n in now if n not in set(start["seen"])]
        return iter(list(self._rows(fresh))), {"seen": now}

    def readBetweenOffsets(self, start: dict, end: dict):
        fresh = [n for n in end["seen"] if n not in set(start["seen"])]
        return iter(list(self._rows(fresh)))

    def commit(self, end: dict) -> None:
        pass  # files are immutable; nothing to release


class _ShardWritten(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class GzJsonlWriter(DataSourceArrowWriter):
    """Write side: each task streams its partition into a temp gz
    shard; commit() renames all temp shards into place (task retries
    overwrite their own temp file, so a speculative duplicate never
    double-publishes), abort() removes them — the two-phase commit
    every distributed sink needs.

    Arrow writer (DataSourceArrowWriter): the JVM hands each task
    RecordBatches, so the process boundary is columnar Arrow IPC —
    the same symmetric contract as the read side (arrowio.py). The
    per-row work that remains is the JSONL text encoding itself,
    done from plain Python lists (one to_pylist per column per
    batch), never via pickled Row objects."""

    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("gzjsonl requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f"_tmp-{uuid.uuid4().hex}.jsonl.gz")
        n = 0
        with gzip.open(tmp, "wt", encoding="utf-8") as fh:
            for batch in iterator:
                names = batch.schema.names
                cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
                ti = names.index("trace_id")
                pi = names.index("param_index")
                pl = names.index("payload")
                for t, p, s in zip(cols[ti], cols[pi], cols[pl]):
                    fh.write(
                        json.dumps(
                            {
                                "trace_id": t,
                                "param_index": p,
                                "payload": s,
                            }
                        )
                        + "\n"
                    )
                    n += 1
        return _ShardWritten(tmp, n)

    def commit(self, messages):
        if self.overwrite:
            for name in os.listdir(self.dir):
                if name.endswith(".jsonl.gz") and not name.startswith("_tmp-"):
                    os.remove(os.path.join(self.dir, name))
        for i, m in enumerate(messages):
            final = os.path.join(self.dir, f"shard-{i:05d}.jsonl.gz")
            os.replace(m.path, final)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class GzJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gzjsonl"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return GzJsonlReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return GzJsonlStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return GzJsonlWriter(self.options, overwrite)


def register(spark) -> None:
    # the reader implements pushFilters(); Spark 4 refuses to plan a
    # pushFilters-bearing source unless the opt-in is set
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GzJsonlDataSource)
