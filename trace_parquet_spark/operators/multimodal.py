"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Mirrors how a 100 TB multimodal corpus is laid out: one ``binary``
column per modality plus a metadata struct, processed by
Arrow-batched ``mapInPandas`` stages. The container has no image/audio
codecs, so the *decode* step is stubbed two ways:

- ``decode_image_stub`` raises ``NotImplementedError`` — the marked
  seam where a real codec (Pillow/torchvision/ffmpeg) plugs in;
- ``fake_decode_features`` is the deterministic stand-in used by tests
  and the oracle-checked query: header fields + a byte-histogram
  sketch computed from the payload itself, so the Spark-side plumbing
  (schema, batching, partition parallelism) is fully exercised.

The test corpus has no binary column, so ``attach_blob`` synthesizes
one from ``documents.text`` (UTF-8 bytes) — byte-identical in any
engine, which is what makes the pipeline oracle-checkable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.registry import load_table, load_table_parallel

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("first_byte", T.LongType(), True),
        T.StructField("n_chunks", T.LongType(), True),
        T.StructField("ascii_lower_frac", T.DoubleType(), True),
    ]
)

CHUNK = 64


def attach_blob(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload: binary, media_type)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def decode_image_stub(payload: bytes) -> "object":
    """The real-codec seam. Deliberately unimplemented here."""
    raise NotImplementedError(
        "image decode requires a codec library (e.g. Pillow) not present "
        "in this environment; plug it in here"
    )


def fake_decode_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Partition-parallel mapInPandas: each batch is a pandas DataFrame;
    per-payload work is pure Python/NumPy on in-memory bytes — the
    exact execution shape a real decoder would use (decode → resize →
    embed), with deterministic fake features instead."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.map(lambda b: 0 if b is None else len(b))
            first = payloads.map(lambda b: int(b[0]) if b else None)
            chunks = (n + (CHUNK - 1)) // CHUNK
            lower = payloads.map(
                lambda b: sum(1 for x in b if 0x61 <= x <= 0x7A) / max(len(b), 1)
                if b is not None
                else None
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": n.astype("int64"),
                    "first_byte": first,
                    "n_chunks": chunks.astype("int64"),
                    # half-up (SQL round semantics), not pandas half-even
                    "ascii_lower_frac": np.floor(lower * 1e6 + 0.5) / 1e6,
                }
            )

    return blobs.mapInPandas(extract, FEATURE_SCHEMA)


FRAME_CHARS = 100  # one "frame" = this many decoded chars of payload
MAX_FRAMES = 4  # evenly-spaced sample size per document

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_chars", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)


def frame_sample(blobs: DataFrame) -> DataFrame:
    """One-to-many frame sampling over binary payloads — the video/
    audio shape (decode → pick k evenly-spaced frames → featurize) with
    the codec stubbed to char-chunk "frames" (no media libs in the
    image; a real decoder swaps into the same mapInPandas seam).

    Picks min(4, n_frames) frames at indices floor(i·n/k) — the
    standard uniform temporal sample — and emits one row per frame
    with its md5. Arrow-batched, partition-parallel, output rows ≫ or
    ≪ input rows (mapInPandas is the only UDF shape that can change
    cardinality)."""
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "frame_chars", "frame_md5")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                text = bytes(payload).decode("utf-8")
                n = len(text)
                if n == 0:
                    continue
                n_frames = -(-n // FRAME_CHARS)  # ceil
                k = min(MAX_FRAMES, n_frames)
                for i in range(k):
                    idx = (i * n_frames) // k
                    chunk = text[idx * FRAME_CHARS:(idx + 1) * FRAME_CHARS]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["frame_chars"].append(len(chunk))
                    out["frame_md5"].append(
                        hashlib.md5(chunk.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return blobs.mapInPandas(sample, FRAME_SCHEMA)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = max(4, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 4)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(n, "doc_id")
    )
    return frame_sample(attach_blob(docs)).orderBy("doc_id", "frame_idx")


# Same sampling arithmetic in SQL: unnest(generate_series) provides the
# per-document frame loop; md5 over the SAME char chunk (DuckDB slices
# text by chars, as Python does) makes the hashes comparable.
FRAME_SAMPLE_SQL = f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS L,
         CAST(ceil(length(text) / {FRAME_CHARS}.0) AS BIGINT) AS n_frames,
         LEAST(CAST(ceil(length(text) / {FRAME_CHARS}.0) AS BIGINT),
               {MAX_FRAMES}) AS k
  FROM documents WHERE length(text) > 0
), idx AS (
  SELECT doc_id, text,
         (unnest(generate_series(0, k - 1)) * n_frames) // k AS frame_idx
  FROM d
)
SELECT doc_id,
       frame_idx,
       CAST(length(substring(text, frame_idx * {FRAME_CHARS} + 1,
                             {FRAME_CHARS})) AS BIGINT)  AS frame_chars,
       md5(substring(text, frame_idx * {FRAME_CHARS} + 1, {FRAME_CHARS}))
                                                         AS frame_md5
FROM idx
ORDER BY doc_id, frame_idx
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Python-UDF stages pay a per-task worker/Arrow setup cost, so they
    # want FEWER, fatter partitions than JVM-side stages: cores/4 beats
    # both 1 (no parallelism) and cores (setup-dominated) empirically.
    n = max(4, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 4)
    docs = load_table(spark, sf_dir, "documents").repartition(n, "doc_id")
    return fake_decode_features(attach_blob(docs)).orderBy("doc_id")


# first_byte is BYTE-based and NULL for empty payloads, exactly like
# the pandas extractor (int(b[0]) / None) — ascii(substring(text,1,1))
# would return the first CHARACTER's code point (and 0 for empty),
# diverging on any non-ASCII leading char. The fraction uses the same
# floor(x*1e6+0.5) half-up grid as the Python side, not round().
MULTIMODAL_SQL = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT)            AS byte_len,
       CASE WHEN octet_length(encode(text)) = 0 THEN NULL
            ELSE CAST(CAST(('0x' || left(hex(encode(text)), 2)) AS INT) AS BIGINT)
       END                                                   AS first_byte,
       CAST((octet_length(encode(text)) + {CHUNK - 1}) // {CHUNK} AS BIGINT) AS n_chunks,
       floor(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
             / greatest(octet_length(encode(text)), 1) * 1e6 + 0.5) / 1e6
                                                             AS ascii_lower_frac
FROM documents
ORDER BY doc_id
"""


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
}
ORACLES = {
    "multimodal_features": MULTIMODAL_SQL,
    "multimodal_frame_sample": FRAME_SAMPLE_SQL,
}
