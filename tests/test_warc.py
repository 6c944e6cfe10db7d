"""WARC connector (sources/warc.py): framing round-trip, multi-member
gzip, type pushdown, and the registry entry's reconciliation."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from trace_parquet_spark.sources.warc import (
    parse_warc_bytes,
    register,
    warc_ingest_totals,
    write_warc,
)


def test_warc_framing_roundtrip(tmp_path):
    path = str(tmp_path / "a.warc.gz")
    recs = [
        {
            "record_id": f"<urn:x:{i}>",
            "warc_type": "response" if i % 2 == 0 else "request",
            "target_uri": f"http://t/{i}",
            "warc_date": "2024-01-01T00:00:00Z",
            "payload": f"payload {i} with\r\nnewlines and unicode £{i}",
        }
        for i in range(6)
    ]
    assert write_warc(path, iter(recs)) == 6
    with gzip.open(path, "rb") as fh:
        got = list(parse_warc_bytes(fh.read()))
    assert len(got) == 6
    for (hdrs, block), r in zip(got, recs):
        assert hdrs["warc-record-id"] == r["record_id"]
        assert hdrs["warc-type"] == r["warc_type"]
        assert int(hdrs["content-length"]) == len(r["payload"].encode())
        assert block.decode("utf-8") == r["payload"]


def test_warc_datasource_pushdown_drops_requests(spark, tmp_path):
    path = str(tmp_path / "d")
    import os

    os.makedirs(path)
    write_warc(
        os.path.join(path, "p.warc.gz"),
        [
            {
                "record_id": "<urn:1>", "warc_type": "response",
                "target_uri": "http://t/1",
                "warc_date": "2024-01-01T00:00:00Z", "payload": "hello",
            },
            {
                "record_id": "<urn:2>", "warc_type": "request",
                "target_uri": "http://t/1",
                "warc_date": "2024-01-01T00:00:00Z", "payload": "GET /",
            },
        ],
    )
    register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("warc").option("path", path).load()
        .filter(F.col("warc_type") == "response")
    )
    rows = df.collect()
    assert [r.record_id for r in rows] == ["<urn:1>"]
    assert rows[0].payload == "hello" and rows[0].content_length == 5


def test_warc_ingest_totals_reconciles(spark, sf_dir):
    from trace_parquet_spark.sources.registry import load_table

    got = {r.source: r for r in warc_ingest_totals(spark, sf_dir).collect()}
    want = {
        r.source: r
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.octet_length("text")).alias("b"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for s, w in want.items():
        assert got[s].n_docs == w.n
        assert got[s].total_bytes == w.b


def test_warc_framing_property():
    """Property: write ∘ parse is the identity for arbitrary payloads
    (unicode, embedded CRLFs, empty, long) and record counts — the
    framing never desynchronizes because Content-Length is exact
    bytes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import io
    import gzip as _gzip
    import os
    import tempfile

    payloads = st.lists(
        st.text(max_size=400), min_size=0, max_size=8
    )

    @settings(max_examples=60, deadline=None)
    @given(payloads)
    def check(texts):
        fd, path = tempfile.mkstemp(suffix=".warc.gz")
        os.close(fd)
        os.unlink(path)
        try:
            recs = [
                {
                    "record_id": f"<urn:p:{i}>",
                    "warc_type": "response",
                    "target_uri": f"http://t/{i}",
                    "warc_date": "2024-01-01T00:00:00Z",
                    "payload": t,
                }
                for i, t in enumerate(texts)
            ]
            assert write_warc(path, iter(recs)) == len(recs)
            if not recs:
                assert not os.path.exists(path) or os.path.getsize(path) == 0
                return
            with _gzip.open(path, "rb") as fh:
                got = list(parse_warc_bytes(fh.read()))
            assert len(got) == len(recs)
            for (hdrs, block), r in zip(got, recs):
                assert block.decode("utf-8") == r["payload"]
                assert hdrs["warc-record-id"] == r["record_id"]
        finally:
            if os.path.exists(path):
                os.unlink(path)

    check()


def test_warc_stream_delivers_archives_exactly_once(spark, tmp_path):
    """readStream over a WARC directory: each arriving archive is one
    micro-batch; a restart resumes from the checkpointed offset and
    never re-delivers."""
    import os

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    def rec(i):
        return {
            "record_id": f"<urn:s:{i}>", "warc_type": "response",
            "target_uri": f"http://t/{i}",
            "warc_date": "2024-01-01T00:00:00Z", "payload": f"doc {i}",
        }

    register(spark)

    def run_once():
        q = (
            spark.readStream.format("warc").option("path", src).load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_warc(os.path.join(src, "a.warc.gz"), [rec(0), rec(1)])
    run_once()
    write_warc(os.path.join(src, "b.warc.gz"), [rec(2)])
    run_once()  # restart from checkpoint; only archive b is fresh
    rows = spark.read.parquet(out).collect()
    assert sorted(r.record_id for r in rows) == [
        "<urn:s:0>", "<urn:s:1>", "<urn:s:2>"
    ]


def test_warc_pushfilters_conjunction_intersects():
    # Two warc_type filters in one conjunction (EqualTo AND In): both
    # are consumed, so BOTH must constrain the scan. Round-7 bug:
    # the second assignment overwrote the first, silently widening
    # the result to whichever filter arrived last.
    from pyspark.sql.datasource import EqualTo, In

    from trace_parquet_spark.sources.warc import WarcReader

    r = WarcReader({"path": "/nonexistent-ok-for-unit"})
    leftover = list(
        r.pushFilters(
            [
                In(("warc_type",), ("response", "request")),
                EqualTo(("warc_type",), "response"),
            ]
        )
    )
    assert leftover == []  # both consumed...
    assert r.allowed_types == {"response"}  # ...and intersected

    # order-independence: EqualTo first, then a disjoint In ⇒ empty set
    r2 = WarcReader({"path": "/nonexistent-ok-for-unit"})
    list(
        r2.pushFilters(
            [
                EqualTo(("warc_type",), "metadata"),
                In(("warc_type",), ("response",)),
            ]
        )
    )
    assert r2.allowed_types == set()


def test_warc_non_utf8_payload_survives(spark, tmp_path):
    # Real Common Crawl response payloads are frequently NOT UTF-8;
    # one bad record must not kill the archive partition. The reader
    # lossy-decodes (U+FFFD), it does not raise.
    path = str(tmp_path / "bin.warc.gz")
    block = b"latin1 caf\xe9 and raw \xff\xfe bytes"
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Record-ID: <urn:x:bin>\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        "WARC-Target-URI: http://t/bin\r\n"
        f"Content-Length: {len(block)}\r\n"
        "\r\n"
    ).encode()
    with open(path, "wb") as out:
        out.write(gzip.compress(head + block + b"\r\n\r\n", mtime=0))
    write_warc(
        path,
        [
            {
                "record_id": "<urn:x:ok>",
                "warc_type": "response",
                "target_uri": "http://t/ok",
                "warc_date": "2024-01-01T00:00:00Z",
                "payload": "clean utf-8",
            }
        ],
    )
    register(spark)
    rows = (
        spark.read.format("warc")
        .option("path", str(tmp_path))
        .load()
        .orderBy("record_id")
        .collect()
    )
    assert [r.record_id for r in rows] == ["<urn:x:bin>", "<urn:x:ok>"]
    assert rows[0].content_length == len(block)
    assert "�" in rows[0].payload  # lossy, flagged, not fatal
    assert rows[0].payload.startswith("latin1 caf")
    assert rows[1].payload == "clean utf-8"
