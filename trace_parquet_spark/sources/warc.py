"""WARC (ISO 28500 / Common Crawl) connector via the Python
DataSource API — the crawl-ingestion seam of the training-data
pipeline: the corpus a 100 TB text engine actually starts from
arrives as .warc.gz web archives, and this source lets Catalyst scan
them like any table (one InputPartition per archive file; a
1000-executor cluster reads 1000 archives concurrently), with the
record-type predicate pushed INSIDE the reader so non-response
records (request/metadata/warcinfo) are dropped at the parse loop,
before Arrow serialization.

Format notes (public spec, WARC/1.0):
- each record = version line + CRLF headers + CRLF CRLF + exactly
  Content-Length payload bytes + CRLF CRLF;
- the Common Crawl convention compresses EACH RECORD as its own gzip
  member, so a .warc.gz is both a valid gzip stream and seekable at
  member boundaries; the writer here follows it, and the reader
  decompresses the concatenated members (Python's gzip handles
  multi-member streams natively).

No external warc library is used or needed — the framing is ~30
lines of stdlib parsing. Reference: no counterpart (single-query
export engine; SURVEY §2.1 S8 lists other formats as absent).
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

WARC_SCHEMA_DDL = (
    "record_id string, warc_type string, target_uri string, "
    "warc_date string, content_length bigint, payload string"
)


def _schema_struct() -> StructType:
    # built programmatically, NOT via fromDDL: read() runs in the
    # executor's Python worker where no JVM/SparkSession exists to
    # parse DDL
    from pyspark.sql.types import LongType, StringType, StructField

    return StructType(
        [
            StructField("record_id", StringType()),
            StructField("warc_type", StringType()),
            StructField("target_uri", StringType()),
            StructField("warc_date", StringType()),
            StructField("content_length", LongType()),
            StructField("payload", StringType()),
        ]
    )


def write_warc(path: str, records) -> int:
    """Append WARC/1.0 records to a .warc.gz, one gzip member per
    record (the Common Crawl convention). ``records`` yields dicts
    with keys record_id, warc_type, target_uri, warc_date, payload
    (str). Returns the record count."""
    n = 0
    with open(path, "ab") as out:
        for r in records:
            block = r["payload"].encode("utf-8")
            head = (
                "WARC/1.0\r\n"
                f"WARC-Type: {r['warc_type']}\r\n"
                f"WARC-Record-ID: {r['record_id']}\r\n"
                f"WARC-Date: {r['warc_date']}\r\n"
                f"WARC-Target-URI: {r['target_uri']}\r\n"
                f"Content-Length: {len(block)}\r\n"
                "\r\n"
            ).encode("utf-8")
            out.write(gzip.compress(head + block + b"\r\n\r\n", mtime=0))
            n += 1
    return n


def parse_warc_bytes(buf: bytes):
    """Yield (headers_dict, payload_bytes) per record from a
    decompressed WARC stream. Framing is exact: Content-Length bytes
    of block, then the mandatory CRLF CRLF record separator."""
    i, n = 0, len(buf)
    while i < n:
        while buf[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        j = buf.index(b"\r\n\r\n", i)
        lines = buf[i:j].decode("utf-8").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        clen = int(hdrs["content-length"])
        yield hdrs, buf[j + 4 : j + 4 + clen]
        i = j + 4 + clen


class _ArchivePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("warc requires option 'path'")
        self.allowed_types: set | None = None

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("warc_type",):
                s = {f.value}
            elif isinstance(f, In) and f.attribute == ("warc_type",):
                s = set(f.value)  # In.value is the tuple of list values
            else:
                yield f  # not ours — Spark re-applies it post-scan
                continue
            # Conjunctions can push MORE THAN ONE warc_type filter
            # (e.g. EqualTo AND In). Every consumed filter must hold,
            # so intersect — overwriting would silently keep only the
            # last predicate while Spark, told both were consumed,
            # never re-applies the first.
            self.allowed_types = (
                s if self.allowed_types is None else self.allowed_types & s
            )

    def partitions(self):
        return [
            _ArchivePartition(os.path.join(self.dir, n))
            for n in sorted(os.listdir(self.dir))
            if n.endswith(".warc.gz")
        ]

    def read(self, partition: _ArchivePartition):
        # Arrow-vectorized: record framing stays Python (it's a text
        # format) but rows ship to the JVM as RecordBatches, not
        # per-row pickled tuples (sources/arrowio.py)
        from .arrowio import tuples_to_batches

        def rows():
            with gzip.open(partition.path, "rb") as fh:
                buf = fh.read()
            allowed = self.allowed_types
            for hdrs, block in parse_warc_bytes(buf):
                wtype = hdrs.get("warc-type", "")
                if allowed is not None and wtype not in allowed:
                    continue
                yield (
                    hdrs.get("warc-record-id", ""),
                    wtype,
                    hdrs.get("warc-target-uri", ""),
                    hdrs.get("warc-date", ""),
                    len(block),
                    block.decode("utf-8", errors="replace"),  # real crawls carry non-UTF-8 bytes; lossy-decode (U+FFFD) instead of killing the partition
                )

        yield from tuples_to_batches(rows(), _schema_struct())


class WarcStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: tails the archive directory, offset = the
    sorted list of archives already delivered — the crawl-drop shape
    (each arriving .warc.gz is one micro-batch of records). Same
    offset/commit contract as the gzjsonl stream: checkpointable and
    replayable via readBetweenOffsets."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("warc requires option 'path'")

    def _files(self) -> list[str]:
        return sorted(
            n for n in os.listdir(self.dir) if n.endswith(".warc.gz")
        )

    def _rows(self, names):
        for name in names:
            with gzip.open(os.path.join(self.dir, name), "rb") as fh:
                buf = fh.read()
            for hdrs, block in parse_warc_bytes(buf):
                yield (
                    hdrs.get("warc-record-id", ""),
                    hdrs.get("warc-type", ""),
                    hdrs.get("warc-target-uri", ""),
                    hdrs.get("warc-date", ""),
                    len(block),
                    block.decode("utf-8", errors="replace"),  # real crawls carry non-UTF-8 bytes; lossy-decode (U+FFFD) instead of killing the partition
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
        pass  # archives are immutable; nothing to release


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return WarcReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return WarcStreamReader(self.options)


def register(spark) -> None:
    # the reader implements pushFilters(); Spark 4 refuses to plan a
    # pushFilters-bearing source unless the opt-in is set
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcDataSource)


# --------------------------------------------------------------------------
# driver-gated query
# --------------------------------------------------------------------------

QUERIES: dict = {}
ORACLES: dict = {}


def warc_ingest_totals(spark, sf_dir: str):
    """Drive the WARC connector end-to-end under the oracle gate:
    write the documents table out as sharded Common-Crawl-style
    .warc.gz archives (one response record per document, whose
    Target-URI encodes source and doc_id, PLUS one request record per
    shard that the type pushdown must drop), read them back through
    format('warc') filtered to responses, and aggregate per
    URI-extracted source. The oracle recomputes from documents alone,
    so agreement proves record framing, per-member gzip round-trip,
    header fidelity, payload byte length, and the pushdown's
    correctness (a leaked request record would shift every count)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .registry import load_table

    register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    work = tempfile.mkdtemp(prefix="warc_")
    try:
        # shard deterministically; write each shard distributed via
        # foreachPartition-free collect per shard is driver-sized at
        # test SF — at real scale this side is mapInPandas over
        # shards; the READ path is the product being gated
        n_shards = 4
        rows = docs.collect()
        for s in range(n_shards):
            path = os.path.join(work, f"part-{s:05d}.warc.gz")
            write_warc(
                path,
                (
                    {
                        "record_id": f"<urn:doc:{r.doc_id}>",
                        "warc_type": "response",
                        "target_uri": (
                            f"http://corpus.test/{r.source}/{r.doc_id}"
                        ),
                        "warc_date": "2024-01-01T00:00:00Z",
                        "payload": r.text,
                    }
                    for r in rows
                    if r.doc_id % n_shards == s
                ),
            )
            write_warc(
                path,
                [
                    {
                        "record_id": f"<urn:req:{s}>",
                        "warc_type": "request",
                        "target_uri": "http://corpus.test/robots.txt",
                        "warc_date": "2024-01-01T00:00:00Z",
                        "payload": "GET /robots.txt HTTP/1.1",
                    }
                ],
            )
        scan = (
            spark.read.format("warc")
            .option("path", work)
            .load()
            .filter(F.col("warc_type") == "response")
        )
        out = (
            scan.select(
                F.element_at(F.split("target_uri", "/"), -2).alias("source"),
                F.element_at(F.split("target_uri", "/"), -1)
                .cast("long")
                .alias("doc_id"),
                "content_length",
                F.length("payload").cast("long").alias("n_chars"),
            )
            .groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("content_length").cast("long").alias("total_bytes"),
                F.sum("n_chars").cast("long").alias("total_chars"),
                F.min("doc_id").cast("long").alias("min_doc"),
                F.max("doc_id").cast("long").alias("max_doc"),
            )
            .orderBy("source")
        )
        collected = out.collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        collected,
        "source string, n_docs long, total_bytes long, total_chars long, "
        "min_doc long, max_doc long",
    ).orderBy("source")


WARC_SQL = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM documents
GROUP BY source
ORDER BY source
"""

QUERIES["warc_ingest_totals"] = warc_ingest_totals
ORACLES["warc_ingest_totals"] = WARC_SQL
