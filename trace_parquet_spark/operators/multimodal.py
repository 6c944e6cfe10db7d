"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Mirrors how a 100 TB multimodal corpus is laid out: one ``binary``
column per modality plus a metadata struct, processed by
Arrow-batched ``mapInPandas`` stages. The decode step is REAL for the
uncompressed formats a pure-numpy decoder can handle — binary PPM/PGM
(P6/P5) and uncompressed 24-bit BMP via ``decode_image`` — AND for the
compressed formats implemented from their public specs: baseline PNG
(stdlib zlib DEFLATE + all five scanline filters), GIF89a (LZW), and
baseline JPEG (pure-numpy DCT + Annex K Huffman, operators/jpeg.py).
The same seam accepts a full codec library (Pillow/ffmpeg) when one
is present:

- ``decode_image`` sniffs the magic bytes and returns an H×W×C uint8
  numpy array (the contract a real codec stage would satisfy);
- ``image_decode_roundtrip`` is the oracle-gated query: deterministic
  images are rendered from ``documents.text`` bytes, encoded to
  PPM/BMP (alternating by doc parity), decoded back through the
  mapInPandas seam, and reduced to exact integer channel means + a
  pixel md5 that DuckDB re-derives INDEPENDENTLY from the same text
  bytes — a hash-match proves the encode→decode round-trip is
  pixel-exact;
- ``fake_decode_features`` remains the deterministic stand-in for
  arbitrary (non-image) payloads: header fields + byte-histogram
  sketch, exercising schema/batching/partition plumbing on any blob.

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


# --------------------------------------------------------------------------
# image codecs: pure-numpy PPM/PGM (P5/P6) and uncompressed 24-bit BMP
# --------------------------------------------------------------------------


def _ppm_header_tokens(b: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse ``n_tokens`` whitespace-separated integers after the
     2-byte magic, skipping ``#`` comments (netpbm allows them anywhere
    in the header). Returns (tokens, offset-of-raster)."""
    toks: list[int] = []
    i = 2
    cur = b""
    while len(toks) < n_tokens:
        if i >= len(b):
            raise ValueError("truncated PPM/PGM header")
        c = b[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(b) and b[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            if cur:
                toks.append(int(cur))
                cur = b""
        elif c.isdigit():
            cur += c
        else:
            raise ValueError(f"bad PPM/PGM header byte {c!r}")
        i += 1
    # exactly ONE whitespace byte follows the maxval token (netpbm
    # spec); `i` already consumed it
    return toks, i


def _decode_ppm(b: bytes) -> np.ndarray:
    """Binary netpbm: P6 (RGB) → H×W×3 uint8, P5 (gray) → H×W×1."""
    channels = 3 if b[:2] == b"P6" else 1
    (w, h, maxval), off = _ppm_header_tokens(b, 3)
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    need = w * h * channels
    raster = b[off : off + need]
    if len(raster) != need:
        raise ValueError(f"truncated raster: want {need}, got {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, channels)


def _decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) 24-bit BMP → H×W×3 uint8 RGB. Handles
    4-byte row padding and both bottom-up (positive height, the norm)
    and top-down (negative height) rasters."""
    if len(b) < 54:
        raise ValueError("truncated BMP header")
    data_off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    need = stride * h
    raster = b[data_off : data_off + need]
    if len(raster) != need:
        raise ValueError(f"truncated raster: want {need}, got {len(raster)}")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR → RGB


def decode_image(payload: bytes) -> np.ndarray:
    """The codec seam, now real for uncompressed formats: sniffs the
    magic bytes and decodes PPM/PGM/BMP to an H×W×C uint8 array. A
    compressed-format library (Pillow etc.) slots in here as another
    magic-bytes branch with the same array contract."""
    b = bytes(payload)
    if b[:2] in (b"P6", b"P5"):
        return _decode_ppm(b)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:8] == _PNG_SIG:
        return _decode_png(b)
    if b[:4] == b"GIF8":
        return _decode_gif(b)
    if b[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(b)
    raise ValueError(f"unrecognized image magic {b[:2]!r}")


def encode_ppm(px: np.ndarray) -> bytes:
    """H×W×3 uint8 → binary P6 (the seed/fixture side, like F4's gzip
    compressor: deterministic bytes, no library needed)."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def encode_bmp(px: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB → uncompressed 24-bit bottom-up BMP."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    body = raster.tobytes()
    size = 54 + len(body)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 DPI
        + (0).to_bytes(4, "little") * 2
    )
    return header + body


# --------------------------------------------------------------------------
# PNG codec: pure numpy + stdlib zlib — a real COMPRESSED image format.
# Baseline subset: 8-bit greyscale (color type 0) and truecolor (2),
# no interlace, all five scanline filters (None/Sub/Up/Average/Paeth).
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def _paeth_pred(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4) over int arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(px: np.ndarray, level: int = 6) -> bytes:
    """H×W×3 (truecolor) or H×W (greyscale) uint8 → PNG. Each scanline
    uses filter ``y % 5``, so a round-trip exercises every filter type
    the decoder implements, not just the trivial one."""
    import struct
    import zlib

    grey = px.ndim == 2
    h, w = px.shape[:2]
    bpp = 1 if grey else 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if grey else 2, 0, 0, 0)
    raw = px.reshape(h, w * bpp).astype(np.int16)
    lines = []
    prior = np.zeros(w * bpp, dtype=np.int16)
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
        up_left = np.concatenate([np.zeros(bpp, np.int16), prior[:-bpp]])
        ftype = y % 5
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prior
        elif ftype == 3:
            filt = cur - (left + prior) // 2
        else:
            filt = cur - _paeth_pred(left, prior, up_left)
        lines.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
        prior = cur
    idat = zlib.compress(b"".join(lines), level)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(b: bytes) -> np.ndarray:
    """PNG (8-bit grey/truecolor, non-interlaced) → H×W[×3] uint8.
    Walks the chunk stream with CRC verification, inflates IDAT, and
    unfilters each scanline: Up and Sub are vectorized (Sub via
    modular cumsum — addition mod 256 telescopes), Average/Paeth walk
    the scanline (their predictors consume just-reconstructed bytes,
    inherently sequential)."""
    import struct
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos = 8
    idat = bytearray()
    w = h = ctype = None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", b[pos + 8 + ln : pos + 12 + ln])
        if crc != zlib.crc32(typ + data):
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype not in (0, 2) or comp or filt or inter:
                raise ValueError(
                    "only 8-bit grey/truecolor non-interlaced PNG supported"
                )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    bpp = 1 if ctype == 0 else 3
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype = row[0]
        line = np.frombuffer(row[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:
            recon = line
        elif ftype == 1:
            recon = (np.cumsum(line.reshape(-1, bpp), axis=0) % 256).reshape(-1)
        elif ftype == 2:
            recon = (line + prior) % 256
        elif ftype == 3:
            recon = line.copy()
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                recon[x] = (recon[x] + (left + prior[x]) // 2) % 256
        elif ftype == 4:
            recon = line.copy()
            for x in range(stride):
                a = recon[x - bpp] if x >= bpp else 0
                c = prior[x - bpp] if x >= bpp else 0
                recon[x] = (recon[x] + _paeth_pred(a, prior[x], c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prior = recon.astype(np.int32)
    return out.reshape(h, w) if bpp == 1 else out.reshape(h, w, 3)


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


# --------------------------------------------------------------------------
# oracle-gated decode round-trip
# --------------------------------------------------------------------------

IMG_W = 16
IMG_H = 16
_IMG_BYTES = IMG_W * IMG_H * 3  # 768
_PX_PER_CH = IMG_W * IMG_H  # 256

_IMG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

_ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("width", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("channels", T.LongType(), False),
        T.StructField("mean_r_micro", T.LongType(), False),
        T.StructField("mean_g_micro", T.LongType(), False),
        T.StructField("mean_b_micro", T.LongType(), False),
        T.StructField("pixel_md5", T.StringType(), False),
    ]
)


def _cycle_pixels(data: bytes) -> np.ndarray:
    """Deterministic 16×16 RGB image from arbitrary bytes: the byte
    stream cycled to 768 bytes, row-major RGB."""
    reps = -(-_IMG_BYTES // len(data))
    return np.frombuffer(
        (data * reps)[:_IMG_BYTES], dtype=np.uint8
    ).reshape(IMG_H, IMG_W, 3)


def image_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → decode → featurize, fully oracle-gated: render each
    document's UTF-8 bytes into a deterministic 16×16 RGB image,
    serialize to PPM (even doc_id) or BMP (odd doc_id), decode back
    through ``decode_image``, and reduce the DECODED array to exact
    integer channel means + an md5 over the pixel hex stream. DuckDB
    re-derives the same statistics independently from the text bytes
    (cycled indexing over the hex of encode(text)) without ever seeing
    the image container — a hash match therefore proves both codecs
    reproduce every pixel, not just that the plumbing ran.

    Both stages are Arrow-batched mapInPandas over doc_id-partitioned
    input: per-partition work is |docs|·768 bytes of numpy, no
    shuffle between encode and decode (same partitioning), and the
    image side never leaves the executor."""
    import hashlib

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "payload": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                if not data:
                    continue
                px = _cycle_pixels(data)
                fmt = "ppm" if doc_id % 2 == 0 else "bmp"
                out["doc_id"].append(int(doc_id))
                out["fmt"].append(fmt)
                out["payload"].append(
                    encode_ppm(px) if fmt == "ppm" else encode_bmp(px)
                )
            yield pd.DataFrame(out)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "fmt", "width", "height", "channels",
                "mean_r_micro", "mean_g_micro", "mean_b_micro", "pixel_md5",
            )}
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                px = decode_image(payload)
                h, w, c = px.shape
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out["doc_id"].append(int(doc_id))
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["mean_r_micro"].append(int(sums[0]) * 1_000_000 // (h * w))
                out["mean_g_micro"].append(int(sums[1]) * 1_000_000 // (h * w))
                out["mean_b_micro"].append(int(sums[2]) * 1_000_000 // (h * w))
                out["pixel_md5"].append(
                    hashlib.md5(px.tobytes().hex().encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    n = max(4, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 4)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(n, "doc_id")
        .select("doc_id", "text")
    )
    blobs = docs.mapInPandas(encode, _IMG_SCHEMA)
    return blobs.mapInPandas(decode, _ROUNDTRIP_SCHEMA).orderBy("doc_id")


# The oracle never builds a PPM/BMP container: it indexes the hex of
# encode(text) directly with the same cycled addressing byte p ↦
# text_byte[p mod L], p in [0, 768), channel = p mod 3 — so agreement
# with the Spark side (which reduces the DECODED container) certifies
# the codecs pixel-for-pixel. Integer micro means ((sum·1e6) div 256)
# and an md5 over the lowercase hex stream keep it float-free.
IMAGE_ROUNDTRIP_SQL = f"""
WITH d AS (
  SELECT doc_id,
         octet_length(encode(text)) AS L,
         lower(hex(encode(text)))   AS hx
  FROM documents WHERE length(text) > 0
), px AS (
  SELECT doc_id, L, hx, unnest(generate_series(0, {_IMG_BYTES - 1})) AS p
  FROM d
), byt AS (
  SELECT doc_id, p, p % 3 AS ch,
         substr(hx, 2 * (p % L) + 1, 2) AS hb
  FROM px
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt,
       CAST({IMG_W} AS BIGINT) AS width,
       CAST({IMG_H} AS BIGINT) AS height,
       CAST(3 AS BIGINT)       AS channels,
       CAST(sum(CASE WHEN ch = 0 THEN CAST(('0x' || hb) AS INT) END)
            * 1000000 // {_PX_PER_CH} AS BIGINT) AS mean_r_micro,
       CAST(sum(CASE WHEN ch = 1 THEN CAST(('0x' || hb) AS INT) END)
            * 1000000 // {_PX_PER_CH} AS BIGINT) AS mean_g_micro,
       CAST(sum(CASE WHEN ch = 2 THEN CAST(('0x' || hb) AS INT) END)
            * 1000000 // {_PX_PER_CH} AS BIGINT) AS mean_b_micro,
       md5(string_agg(hb, '' ORDER BY p)) AS pixel_md5
FROM byt
GROUP BY doc_id
ORDER BY doc_id
"""


def png_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compressed-format twin of ``image_decode_roundtrip``: the
    same deterministic 16×16 RGB render of each document's bytes, but
    serialized through the real PNG codec — zlib DEFLATE plus all five
    scanline filters (the encoder cycles filter y % 5) — and decoded
    back through the magic-bytes seam. The DuckDB oracle re-derives the
    channel means + pixel md5 from the text bytes without ever seeing a
    PNG container, so a hash match certifies DEFLATE round-trip and
    every filter's unfilter path pixel-for-pixel. Same Arrow-batched
    two-stage mapInPandas shape as the uncompressed codecs: no shuffle
    between encode and decode, payloads never leave the executor."""
    import hashlib

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "payload": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                if not data:
                    continue
                out["doc_id"].append(int(doc_id))
                out["fmt"].append("png")
                out["payload"].append(encode_png(_cycle_pixels(data)))
            yield pd.DataFrame(out)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "fmt", "width", "height", "channels",
                "mean_r_micro", "mean_g_micro", "mean_b_micro", "pixel_md5",
            )}
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                px = decode_image(payload)
                h, w, c = px.shape
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out["doc_id"].append(int(doc_id))
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["mean_r_micro"].append(int(sums[0]) * 1_000_000 // (h * w))
                out["mean_g_micro"].append(int(sums[1]) * 1_000_000 // (h * w))
                out["mean_b_micro"].append(int(sums[2]) * 1_000_000 // (h * w))
                out["pixel_md5"].append(
                    hashlib.md5(px.tobytes().hex().encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    n = max(4, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 4)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(n, "doc_id")
        .select("doc_id", "text")
    )
    blobs = docs.mapInPandas(encode, _IMG_SCHEMA)
    return blobs.mapInPandas(decode, _ROUNDTRIP_SCHEMA).orderBy("doc_id")


# Identical container-free derivation as IMAGE_ROUNDTRIP_SQL — the
# oracle's pixel stats depend only on the render, never the codec, so
# reusing the derivation with fmt='png' is exactly the point: the PNG
# encode→decode chain must reproduce the same pixels the uncompressed
# codecs do.
PNG_ROUNDTRIP_SQL = f"""
WITH d AS (
  SELECT doc_id,
         octet_length(encode(text)) AS L,
         lower(hex(encode(text)))   AS hx
  FROM documents WHERE length(text) > 0
), px AS (
  SELECT doc_id, L, hx, unnest(generate_series(0, {_IMG_BYTES - 1})) AS p
  FROM d
), byt AS (
  SELECT doc_id, p, p % 3 AS ch,
         substr(hx, 2 * (p % L) + 1, 2) AS hb
  FROM px
)
SELECT doc_id,
       'png' AS fmt,
       CAST({IMG_W} AS BIGINT) AS width,
       CAST({IMG_H} AS BIGINT) AS height,
       CAST(3 AS BIGINT)       AS channels,
       CAST(sum(CASE WHEN ch = 0 THEN CAST(('0x' || hb) AS INT) END)
            * 1000000 // {_PX_PER_CH} AS BIGINT) AS mean_r_micro,
       CAST(sum(CASE WHEN ch = 1 THEN CAST(('0x' || hb) AS INT) END)
            * 1000000 // {_PX_PER_CH} AS BIGINT) AS mean_g_micro,
       CAST(sum(CASE WHEN ch = 2 THEN CAST(('0x' || hb) AS INT) END)
            * 1000000 // {_PX_PER_CH} AS BIGINT) AS mean_b_micro,
       md5(string_agg(hb, '' ORDER BY p)) AS pixel_md5
FROM byt
GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# audio codec: PCM WAV (RIFF), pure numpy
# --------------------------------------------------------------------------

SAMPLE_RATE = 16_000
N_SAMPLES = 512
_PCM_BYTES = N_SAMPLES * 2  # int16 mono


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PCM WAV → (sample_rate, channels, int16 samples[n, channels]).
    Walks RIFF chunks (fmt may be followed by LIST/fact/etc. before
    data), supports 16-bit integer PCM only — the uncompressed format
    a numpy decoder can own; compressed codecs slot in at the same
    seam."""
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit integer PCM supported (fmt={audio_format}, bits={bits})")
    samples = np.frombuffer(
        data[: len(data) - (len(data) % (2 * channels))], dtype="<i2"
    ).reshape(-1, channels)
    return rate, channels, samples


def encode_wav(samples: np.ndarray, rate: int = SAMPLE_RATE) -> bytes:
    """int16 samples[n, channels] → canonical PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    body = samples.astype("<i2").tobytes()
    block = channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(body).to_bytes(4, "little") + body
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

_AUDIO_RT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), False),
        T.StructField("channels", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("min_s", T.LongType(), False),
        T.StructField("max_s", T.LongType(), False),
        T.StructField("sum_sq", T.LongType(), False),
        T.StructField("pcm_md5", T.StringType(), False),
    ]
)


def audio_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio sibling of image_decode_roundtrip: deterministic
    int16 PCM rendered from each document's UTF-8 bytes (little-endian
    pairs cycled to 512 samples), containerized as PCM WAV, decoded
    back through ``decode_wav``, and reduced to exact integer waveform
    statistics (min/max sample, int64 energy sum, md5 over the PCM hex
    stream). DuckDB re-derives all of it from the text bytes without
    parsing a RIFF container — the hash match certifies the WAV
    round-trip sample-for-sample."""
    import hashlib

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                if not data:
                    continue
                reps = -(-_PCM_BYTES // len(data))
                pcm = np.frombuffer(
                    (data * reps)[:_PCM_BYTES], dtype="<i2"
                ).reshape(N_SAMPLES, 1)
                out["doc_id"].append(int(doc_id))
                out["payload"].append(encode_wav(pcm))
            yield pd.DataFrame(out)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "channels", "n_samples",
                "min_s", "max_s", "sum_sq", "pcm_md5",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, channels, samples = decode_wav(payload)
                s = samples.astype(np.int64)
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["channels"].append(channels)
                out["n_samples"].append(samples.shape[0])
                out["min_s"].append(int(s.min()))
                out["max_s"].append(int(s.max()))
                out["sum_sq"].append(int((s * s).sum()))
                out["pcm_md5"].append(
                    hashlib.md5(
                        samples.astype("<i2").tobytes().hex().encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(out)

    n = max(4, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 4)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(n, "doc_id")
        .select("doc_id", "text")
    )
    blobs = docs.mapInPandas(encode, _AUDIO_SCHEMA)
    return blobs.mapInPandas(decode, _AUDIO_RT_SCHEMA).orderBy("doc_id")


# Sample i = int16-LE from text bytes at (2i, 2i+1) mod L — the oracle
# indexes the hex of encode(text) directly, container-free; signed via
# raw − 65536 when raw ≥ 32768. Energy/min/max in exact BIGINTs.
AUDIO_ROUNDTRIP_SQL = f"""
WITH d AS (
  SELECT doc_id,
         octet_length(encode(text)) AS L,
         lower(hex(encode(text)))   AS hx
  FROM documents WHERE length(text) > 0
), pos AS (
  SELECT doc_id, L, hx, unnest(generate_series(0, {N_SAMPLES - 1})) AS i
  FROM d
), smp AS (
  SELECT doc_id, i,
         substr(hx, 2 * ((2 * i) % L) + 1, 2)     AS lo_hb,
         substr(hx, 2 * ((2 * i + 1) % L) + 1, 2) AS hi_hb,
         CAST(('0x' || substr(hx, 2 * ((2 * i) % L) + 1, 2)) AS INT)
         + 256 * CAST(('0x' || substr(hx, 2 * ((2 * i + 1) % L) + 1, 2)) AS INT)
           AS raw
  FROM pos
), sgn AS (
  SELECT doc_id, i, lo_hb, hi_hb,
         CAST(CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS BIGINT) AS v
  FROM smp
)
SELECT doc_id,
       CAST({SAMPLE_RATE} AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT)             AS channels,
       CAST({N_SAMPLES} AS BIGINT)   AS n_samples,
       min(v)                        AS min_s,
       max(v)                        AS max_s,
       CAST(sum(v * v) AS BIGINT)    AS sum_sq,
       md5(string_agg(lo_hb || hi_hb, '' ORDER BY i)) AS pcm_md5
FROM sgn
GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# video codec: YUV4MPEG2 (y4m), pure numpy
# --------------------------------------------------------------------------

VID_W = 8
VID_H = 8
VID_FRAMES = 6
_FRAME_BYTES = VID_W * VID_H  # mono: one Y plane


def decode_y4m(payload: bytes) -> tuple[int, int, np.ndarray]:
    """YUV4MPEG2 → (width, height, frames[n, h, w] uint8). Supports
    mono (Y-only) and 444 (Y plane returned) colorspaces — the raw
    uncompressed video container; inter-frame codecs would plug into
    the same seam."""
    b = bytes(payload)
    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    planes = 1
    for tok in b[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cs = tok[1:]
            if cs == b"mono":
                planes = 1
            elif cs == b"444":
                planes = 3
            else:
                raise ValueError(f"unsupported colorspace {cs!r}")
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    frames = []
    pos = nl + 1
    fsize = w * h * planes
    while pos < len(b):
        fnl = b.find(b"\n", pos)
        if fnl < 0 or b[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        raw = b[fnl + 1 : fnl + 1 + fsize]
        if len(raw) != fsize:
            raise ValueError(f"truncated frame: want {fsize}, got {len(raw)}")
        frames.append(
            np.frombuffer(raw[: w * h], dtype=np.uint8).reshape(h, w)
        )
        pos = fnl + 1 + fsize
    return w, h, np.stack(frames) if frames else np.empty((0, h, w), np.uint8)


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """frames[n, h, w] uint8 → mono YUV4MPEG2 bytes."""
    n, h, w = frames.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 Cmono\n" % (w, h, *fps)]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].astype(np.uint8).tobytes())
    return b"".join(out)


_VIDEO_RT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("width", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("mean_micro", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)


def video_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video sibling: 6 deterministic 8×8 mono frames rendered
    from each document's UTF-8 bytes (cycled, frame f covering byte
    positions [f·64, (f+1)·64)), streamed into a YUV4MPEG2 container,
    decoded back through ``decode_y4m``, and emitted one row per frame
    with its exact integer mean and hex-md5 — one-to-many, like real
    frame extraction. DuckDB derives every frame statistic from the
    text bytes container-free; a hash match certifies the y4m codec
    frame-for-frame."""
    import hashlib

    total = VID_FRAMES * _FRAME_BYTES

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "frame_idx", "width", "height",
                "mean_micro", "frame_md5",
            )}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                if not data:
                    continue
                reps = -(-total // len(data))
                frames = np.frombuffer(
                    (data * reps)[:total], dtype=np.uint8
                ).reshape(VID_FRAMES, VID_H, VID_W)
                w, h, decoded = decode_y4m(encode_y4m(frames))
                for f in range(decoded.shape[0]):
                    px = decoded[f]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(f)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_micro"].append(
                        int(px.sum(dtype=np.int64)) * 1_000_000 // _FRAME_BYTES
                    )
                    out["frame_md5"].append(
                        hashlib.md5(px.tobytes().hex().encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    n = max(4, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 4)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(n, "doc_id")
        .select("doc_id", "text")
    )
    return docs.mapInPandas(roundtrip, _VIDEO_RT_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )


VIDEO_ROUNDTRIP_SQL = f"""
WITH d AS (
  SELECT doc_id,
         octet_length(encode(text)) AS L,
         lower(hex(encode(text)))   AS hx
  FROM documents WHERE length(text) > 0
), px AS (
  SELECT doc_id, L, hx,
         unnest(generate_series(0, {VID_FRAMES * _FRAME_BYTES - 1})) AS p
  FROM d
), byt AS (
  SELECT doc_id, p // {_FRAME_BYTES} AS frame_idx, p,
         substr(hx, 2 * (p % L) + 1, 2) AS hb
  FROM px
)
SELECT doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST({VID_W} AS BIGINT)   AS width,
       CAST({VID_H} AS BIGINT)   AS height,
       CAST(sum(CAST(('0x' || hb) AS INT)) * 1000000 // {_FRAME_BYTES}
            AS BIGINT)           AS mean_micro,
       md5(string_agg(hb, '' ORDER BY p)) AS frame_md5
FROM byt
GROUP BY doc_id, frame_idx
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
    "image_decode_roundtrip": image_decode_roundtrip,
    "png_decode_roundtrip": png_decode_roundtrip,
    "audio_decode_roundtrip": audio_decode_roundtrip,
    "video_decode_roundtrip": video_decode_roundtrip,
}
ORACLES = {
    "multimodal_features": MULTIMODAL_SQL,
    "multimodal_frame_sample": FRAME_SAMPLE_SQL,
    "image_decode_roundtrip": IMAGE_ROUNDTRIP_SQL,
    "png_decode_roundtrip": PNG_ROUNDTRIP_SQL,
    "audio_decode_roundtrip": AUDIO_ROUNDTRIP_SQL,
    "video_decode_roundtrip": VIDEO_ROUNDTRIP_SQL,
}


# --------------------------------------------------------------------------
# image codec: GIF (palette + LZW), pure Python/numpy
# --------------------------------------------------------------------------

# GIF89a with a global color table and ONE image block — the third
# real compressed container after PNG (DEFLATE) and the uncompressed
# PPM/BMP pair, exercising the remaining mainstream compression family
# (dictionary LZW with variable-width codes). Size discipline follows
# the spec's "What's in a GIF" formulation: the ENCODER widens the
# code size after registering entry 2^cs, the DECODER after
# registering entry 2^cs − 1 (it runs one dictionary entry behind);
# codes are packed LSB-first and chopped into ≤255-byte sub-blocks.

_GIF_MAX_CODE_BITS = 12


def _gif_palette(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """(palette[n,3], index-per-pixel, table_bits). Palette order is
    deterministic (sorted packed RGB). GIF caps palettes at 256."""
    flat = px.reshape(-1, 3).astype(np.uint32)
    packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    colors, idx = np.unique(packed, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF palette overflow: {len(colors)} colors")
    table_bits = max(1, int(len(colors) - 1).bit_length())
    pal = np.zeros((1 << table_bits, 3), dtype=np.uint8)
    pal[: len(colors), 0] = (colors >> 16) & 0xFF
    pal[: len(colors), 1] = (colors >> 8) & 0xFF
    pal[: len(colors), 2] = colors & 0xFF
    return pal, idx.astype(np.int64), table_bits


class _BitWriter:
    """LSB-first bit packer (GIF's LZW stream order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += size
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices, mcs: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriter()
    cs = mcs + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    nxt = eoi + 1
    bw.write(clear, cs)
    w = (int(indices[0]),)
    for k in indices[1:]:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        bw.write(table[w], cs)
        if nxt < (1 << _GIF_MAX_CODE_BITS):
            table[wk] = nxt
            if nxt == (1 << cs) and cs < _GIF_MAX_CODE_BITS:
                cs += 1
            nxt += 1
        w = (int(k),)
    bw.write(table[w], cs)
    bw.write(eoi, cs)
    return bw.flush()


def _lzw_decode(data: bytes, mcs: int, n_px: int) -> np.ndarray:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    acc = nbits = pos = 0
    cs = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    nxt = eoi + 1
    out = bytearray()
    prev: bytes | None = None

    def read() -> int:
        nonlocal acc, nbits, pos
        while nbits < cs:
            if pos >= len(data):
                raise ValueError("GIF: truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << cs) - 1)
        acc >>= cs
        nbits -= cs
        return code

    while True:
        code = read()
        if code == clear:
            table = table[: eoi + 1]
            nxt = eoi + 1
            cs = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < nxt:
            entry = table[code]
        elif code == nxt:
            entry = prev + prev[:1]  # the kwkwk case
        else:
            raise ValueError(f"GIF: code {code} beyond table {nxt}")
        out += entry
        if prev is not None and nxt < (1 << _GIF_MAX_CODE_BITS):
            table.append(prev + entry[:1])
            if nxt == (1 << cs) - 1 and cs < _GIF_MAX_CODE_BITS:
                cs += 1
            nxt += 1
        prev = entry
        if len(out) >= n_px:
            break
    if len(out) != n_px:
        raise ValueError(f"GIF: decoded {len(out)} of {n_px} pixels")
    return np.frombuffer(bytes(out), dtype=np.uint8)


def encode_gif(px: np.ndarray) -> bytes:
    """H×W×3 uint8 (≤256 distinct colors) → single-image GIF89a."""
    import struct

    h, w, _ = px.shape
    pal, idx, table_bits = _gif_palette(px)
    mcs = max(2, table_bits)
    body = _lzw_encode(idx, mcs)
    blocks = bytearray()
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((table_bits - 1) & 7), 0, 0)
        + pal.tobytes()
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([mcs])
        + bytes(blocks)
        + b"\x3b"
    )


def _decode_gif(b: bytes) -> np.ndarray:
    import struct

    if b[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    pal = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        pal = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    # skip extension blocks to the image descriptor
    while b[pos] == 0x21:
        pos += 2
        while b[pos]:
            pos += 1 + b[pos]
        pos += 1
    if b[pos] != 0x2C:
        raise ValueError(f"GIF: expected image descriptor at {pos}")
    left, top, iw, ih, ipacked = struct.unpack(
        "<HHHHB", b[pos + 1 : pos + 10]
    )
    pos += 10
    if ipacked & 0x80:  # local color table
        n = 2 << (ipacked & 7)
        pal = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    if ipacked & 0x40:
        raise ValueError("GIF: interlaced images not supported")
    if pal is None:
        raise ValueError("GIF: no color table")
    mcs = b[pos]
    pos += 1
    body = bytearray()
    while b[pos]:
        ln = b[pos]
        body += b[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    idx = _lzw_decode(bytes(body), mcs, iw * ih)
    return pal[idx].reshape(ih, iw, 3)


def gif_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LZW twin of ``png_decode_roundtrip``: the same deterministic
    16×16 RGB render per document, serialized through the real GIF
    codec (palette extraction + variable-width LZW + sub-block
    framing) and decoded back through the magic-bytes seam. The
    container-free DuckDB oracle re-derives the channel means + pixel
    md5 from the text bytes, so the hash match certifies palette
    round-trip and the LZW coder bit-for-bit. Same Arrow-batched
    two-stage mapInPandas shape: no shuffle between encode and decode."""
    import hashlib

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "payload": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                if not data:
                    continue
                out["doc_id"].append(int(doc_id))
                out["fmt"].append("gif")
                out["payload"].append(encode_gif(_cycle_pixels(data)))
            yield pd.DataFrame(out)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "fmt", "width", "height", "channels",
                "mean_r_micro", "mean_g_micro", "mean_b_micro", "pixel_md5",
            )}
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                px = decode_image(payload)
                h, w, c = px.shape
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out["doc_id"].append(int(doc_id))
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["mean_r_micro"].append(int(sums[0]) * 1_000_000 // (h * w))
                out["mean_g_micro"].append(int(sums[1]) * 1_000_000 // (h * w))
                out["mean_b_micro"].append(int(sums[2]) * 1_000_000 // (h * w))
                out["pixel_md5"].append(
                    hashlib.md5(px.tobytes().hex().encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    n = max(4, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 4)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(n, "doc_id")
        .select("doc_id", "text")
    )
    blobs = docs.mapInPandas(encode, _IMG_SCHEMA)
    return blobs.mapInPandas(decode, _ROUNDTRIP_SCHEMA).orderBy("doc_id")


# Same container-free derivation as the PPM/BMP and PNG gates — the
# oracle depends only on the render, so 'gif' agreement certifies the
# palette+LZW chain reproduces the identical pixels.
GIF_ROUNDTRIP_SQL = f"""
WITH d AS (
  SELECT doc_id,
         octet_length(encode(text)) AS L,
         lower(hex(encode(text)))   AS hx
  FROM documents WHERE length(text) > 0
), px AS (
  SELECT doc_id, L, hx, unnest(generate_series(0, {_IMG_BYTES - 1})) AS p
  FROM d
), byt AS (
  SELECT doc_id, p, p % 3 AS ch,
         substr(hx, 2 * (p % L) + 1, 2) AS hb
  FROM px
)
SELECT doc_id,
       'gif' AS fmt,
       CAST({IMG_W} AS BIGINT) AS width,
       CAST({IMG_H} AS BIGINT) AS height,
       CAST(3 AS BIGINT)       AS channels,
       CAST(sum(CASE WHEN ch = 0 THEN CAST(('0x' || hb) AS INT) END)
            * 1000000 // {_PX_PER_CH} AS BIGINT) AS mean_r_micro,
       CAST(sum(CASE WHEN ch = 1 THEN CAST(('0x' || hb) AS INT) END)
            * 1000000 // {_PX_PER_CH} AS BIGINT) AS mean_g_micro,
       CAST(sum(CASE WHEN ch = 2 THEN CAST(('0x' || hb) AS INT) END)
            * 1000000 // {_PX_PER_CH} AS BIGINT) AS mean_b_micro,
       md5(string_agg(hb, '' ORDER BY p)) AS pixel_md5
FROM byt
GROUP BY doc_id
ORDER BY doc_id
"""

QUERIES["gif_decode_roundtrip"] = gif_decode_roundtrip
ORACLES["gif_decode_roundtrip"] = GIF_ROUNDTRIP_SQL


# --------------------------------------------------------------------------
# JPEG: baseline DCT + Huffman (operators/jpeg.py), oracle-gated on the
# mathematically-exact subspace
# --------------------------------------------------------------------------

#: Oracle-gated JPEG quantization: Annex K luminance with the DC step
#: forced to 8, so a constant 8×8 block value v (DC spectrum 8·(v−128))
#: quantizes to exactly v−128 and survives encode→decode pixel-exact —
#: the subspace where a LOSSY codec admits an exact cross-engine oracle.
_JPEG_Q = None


def _jpeg_quant() -> np.ndarray:
    global _JPEG_Q
    if _JPEG_Q is None:
        from .jpeg import QUANT_LUMA

        q = QUANT_LUMA.copy()
        q[0] = 8
        _JPEG_Q = q
    return _JPEG_Q


_JPEG_RT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("width", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("channels", T.LongType(), False),
        T.StructField("mean_micro", T.LongType(), False),
        T.StructField("pixel_md5", T.StringType(), False),
    ]
)


def _block_pixels(data: bytes) -> np.ndarray:
    """Deterministic 16×16 GRAYSCALE image from arbitrary bytes: each
    of the four 8×8 blocks is the constant byte[b mod L] (row-major
    block order b ∈ 0..3). Constant blocks put the whole signal in the
    DC coefficient — the subspace where baseline JPEG is exactly
    lossless with a DC quantizer of 8 — so the decoded pixels are a
    pure function of the text bytes that DuckDB re-derives without a
    JPEG container."""
    vals = np.frombuffer((data * 4)[:4], dtype=np.uint8)
    return np.repeat(np.repeat(vals.reshape(2, 2), 8, 0), 8, 1)


def jpeg_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lossy-codec sibling of ``png_decode_roundtrip``: each
    document's bytes render a 16×16 grayscale image of four constant
    8×8 blocks, serialized through the REAL baseline JPEG codec
    (pure-numpy DCT, Annex K Huffman tables, JFIF markers,
    operators/jpeg.py) and decoded back through the magic-bytes seam.
    Constant blocks have a DC-only spectrum, and with the DC quantizer
    pinned to 8 the chain is mathematically exact — so the DuckDB
    oracle can re-derive mean + pixel md5 from the text bytes alone
    and a hash match certifies markers, Huffman DC coding, byte
    stuffing, dequantization, and the IDCT pixel-for-pixel. (The AC /
    run-length / EOB machinery is pinned coefficient-exact in
    tests/test_image_codec.py — lossy content can't be oracle-hashed
    across engines by construction.) Same two-stage Arrow-batched
    mapInPandas shape: no shuffle between encode and decode, payloads
    never leave the executor."""
    import hashlib

    from .jpeg import encode_jpeg

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q = _jpeg_quant()
        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "payload": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                if not data:
                    continue
                out["doc_id"].append(int(doc_id))
                out["fmt"].append("jpeg")
                out["payload"].append(
                    encode_jpeg(_block_pixels(data), quant_luma=q)
                )
            yield pd.DataFrame(out)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "fmt", "width", "height", "channels",
                "mean_micro", "pixel_md5",
            )}
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                px = decode_image(payload)  # magic-bytes seam → H×W×1
                h, w, c = px.shape
                out["doc_id"].append(int(doc_id))
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["mean_micro"].append(
                    int(px.sum(dtype=np.int64)) * 1_000_000 // (h * w)
                )
                out["pixel_md5"].append(
                    hashlib.md5(px.tobytes().hex().encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    n = max(4, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 4)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(n, "doc_id")
        .select("doc_id", "text")
    )
    blobs = docs.mapInPandas(encode, _IMG_SCHEMA)
    return blobs.mapInPandas(decode, _JPEG_RT_SCHEMA).orderBy("doc_id")


# Container-free derivation: pixel p (row-major over 16×16) belongs to
# block b = (p div 16 div 8)·2 + (p mod 16) div 8, whose constant value
# is text byte b mod L — the oracle never sees a JPEG container, so a
# hash match certifies the codec, not the plumbing.
JPEG_ROUNDTRIP_SQL = f"""
WITH d AS (
  SELECT doc_id,
         octet_length(encode(text)) AS L,
         lower(hex(encode(text)))   AS hx
  FROM documents WHERE length(text) > 0
), px AS (
  SELECT doc_id, L, hx, unnest(generate_series(0, {_PX_PER_CH - 1})) AS p
  FROM d
), byt AS (
  SELECT doc_id, p,
         substr(hx, 2 * ((((p // {IMG_W}) // 8) * 2 + (p % {IMG_W}) // 8) % L) + 1, 2) AS hb
  FROM px
)
SELECT doc_id,
       'jpeg' AS fmt,
       CAST({IMG_W} AS BIGINT) AS width,
       CAST({IMG_H} AS BIGINT) AS height,
       CAST(1 AS BIGINT)       AS channels,
       CAST(sum(CAST(('0x' || hb) AS INT)) * 1000000 // {_PX_PER_CH}
            AS BIGINT) AS mean_micro,
       md5(string_agg(hb, '' ORDER BY p)) AS pixel_md5
FROM byt
GROUP BY doc_id
ORDER BY doc_id
"""

QUERIES["jpeg_decode_roundtrip"] = jpeg_decode_roundtrip
ORACLES["jpeg_decode_roundtrip"] = JPEG_ROUNDTRIP_SQL
