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


QUERIES = {"multimodal_features": multimodal_features}
ORACLES = {"multimodal_features": MULTIMODAL_SQL}
