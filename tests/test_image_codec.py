"""Pure-numpy image codec goldens: hand-built PPM/PGM/BMP byte
fixtures (generated in-test, no files or libraries) decoded to exact
pixel arrays, encode→decode round-trip identity, malformed-input
failure modes, and the oracle-gated registry query's invariants."""

from __future__ import annotations

import numpy as np
import pytest

from trace_parquet_spark.operators.multimodal import (
    IMG_H,
    IMG_W,
    _cycle_pixels,
    decode_image,
    encode_bmp,
    encode_ppm,
)


def _rng_px(h, w, seed=7):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3)
    ).astype(np.uint8)


# ---------------------------------------------------------------- PPM / PGM


def test_ppm_p6_golden_with_comments():
    """2x2 P6 with comments sprinkled through the header (netpbm
    allows them anywhere) decodes to the exact pixel array."""
    raster = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])
    b = b"P6\n# a comment\n2 # inline\n2\n# another\n255\n" + raster
    px = decode_image(b)
    want = np.frombuffer(raster, dtype=np.uint8).reshape(2, 2, 3)
    assert px.shape == (2, 2, 3)
    assert (px == want).all()


def test_pgm_p5_golden():
    b = b"P5\n3 2\n255\n" + bytes([0, 128, 255, 1, 2, 3])
    px = decode_image(b)
    assert px.shape == (2, 3, 1)
    assert px.ravel().tolist() == [0, 128, 255, 1, 2, 3]


def test_ppm_roundtrip_identity():
    px = _rng_px(5, 9)
    assert (decode_image(encode_ppm(px)) == px).all()


# ---------------------------------------------------------------- BMP


def test_bmp_golden_bottom_up_with_padding():
    """3x2 24-bit BMP built by hand: stride 12 (3*3=9 padded to 12),
    bottom-up rows, BGR order — decode must undo all three."""
    px = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[10, 20, 30], [40, 50, 60], [70, 80, 90]]],
        dtype=np.uint8,
    )
    b = encode_bmp(px)
    # container invariants, independent of the decoder
    assert b[:2] == b"BM"
    stride = (3 * 3 + 3) & ~3
    assert len(b) == 54 + stride * 2
    # bottom-up: first raster row is the LAST image row; BGR order
    assert list(b[54:57]) == [30, 20, 10]
    assert (decode_image(b) == px).all()


def test_bmp_top_down_negative_height():
    """Top-down BMPs (negative biHeight) store rows in image order."""
    px = _rng_px(4, 3)
    b = bytearray(encode_bmp(px))
    # flip to top-down: negate height, reverse the row blocks
    stride = (3 * 3 + 3) & ~3
    b[22:26] = (-4).to_bytes(4, "little", signed=True)
    rows = [bytes(b[54 + i * stride : 54 + (i + 1) * stride]) for i in range(4)]
    b[54:] = b"".join(reversed(rows))
    assert (decode_image(bytes(b)) == px).all()


def test_bmp_roundtrip_identity_unpadded_stride():
    # width 16 -> stride 48, already 4-byte aligned (no padding branch)
    px = _rng_px(IMG_H, IMG_W)
    assert (decode_image(encode_bmp(px)) == px).all()


# ---------------------------------------------------------------- failures


@pytest.mark.parametrize(
    "payload",
    [
        b"GIF89a not supported",
        b"P6\n2 2\n255\n" + b"\x00" * 5,  # truncated raster
        b"P6\n2 2\n65535\n" + b"\x00" * 24,  # 16-bit maxval
        b"BM" + b"\x00" * 20,  # truncated BMP header
    ],
)
def test_malformed_inputs_raise(payload):
    with pytest.raises(ValueError):
        decode_image(payload)


def test_bmp_compressed_rejected():
    b = bytearray(encode_bmp(_rng_px(2, 2)))
    b[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(ValueError, match="uncompressed"):
        decode_image(bytes(b))


# ---------------------------------------------------------------- registry


def test_image_roundtrip_query_means_match_source_bytes(spark, sf_dir):
    """The registry query's decoded channel means must equal a direct
    numpy replay on the source text bytes (independent of any
    container), for every document and both formats."""
    from pyspark.sql import functions as F

    from trace_parquet_spark.operators.multimodal import (
        image_decode_roundtrip,
    )
    from trace_parquet_spark.sources.registry import load_table

    got = {r.doc_id: r for r in image_decode_roundtrip(spark, sf_dir).collect()}
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", "text")
        .collect()
    )
    assert set(got) == {r.doc_id for r in docs}
    fmts = set()
    for r in docs:
        px = _cycle_pixels(r.text.encode("utf-8"))
        row = got[r.doc_id]
        fmts.add(row.fmt)
        assert (row.width, row.height, row.channels) == (IMG_W, IMG_H, 3)
        sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        for ch, col in enumerate(("mean_r_micro", "mean_g_micro", "mean_b_micro")):
            assert getattr(row, col) == int(sums[ch]) * 1_000_000 // (IMG_W * IMG_H)
    assert fmts == {"ppm", "bmp"}  # both codecs actually exercised


# ---------------------------------------------------------------- WAV


def test_wav_roundtrip_identity_mono_and_stereo():
    from trace_parquet_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.RandomState(11)
    for ch in (1, 2):
        s = rng.randint(-32768, 32768, size=(300, ch)).astype(np.int16)
        rate, channels, got = decode_wav(encode_wav(s, rate=8000))
        assert (rate, channels) == (8000, ch)
        assert (got == s).all()


def test_wav_golden_bytes_and_extra_chunk():
    """Hand-assembled WAV with a LIST chunk between fmt and data —
    the chunk walk must skip it; samples decode exactly, including
    the odd-size word-alignment rule."""
    from trace_parquet_spark.operators.multimodal import decode_wav

    samples = np.array([0, 1, -1, 32767, -32768], dtype="<i2")
    body = samples.tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (16000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"LIST" + (3).to_bytes(4, "little") + b"odd" + b"\x00"  # padded
    chunks += b"data" + len(body).to_bytes(4, "little") + body
    wav = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
    rate, ch, got = decode_wav(wav)
    assert (rate, ch) == (16000, 1)
    assert got.ravel().tolist() == samples.tolist()


def test_wav_rejects_non_pcm():
    from trace_parquet_spark.operators.multimodal import decode_wav, encode_wav

    b = bytearray(encode_wav(np.zeros((4, 1), dtype=np.int16)))
    b[20:22] = (3).to_bytes(2, "little")  # IEEE float format tag
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(b))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + bytes(40))


# ---------------------------------------------------------------- Y4M


def test_y4m_roundtrip_identity():
    from trace_parquet_spark.operators.multimodal import decode_y4m, encode_y4m

    frames = np.random.RandomState(3).randint(
        0, 256, size=(5, 6, 4)
    ).astype(np.uint8)
    w, h, got = decode_y4m(encode_y4m(frames))
    assert (w, h) == (4, 6)
    assert (got == frames).all()


def test_y4m_golden_and_444_y_plane():
    from trace_parquet_spark.operators.multimodal import decode_y4m

    y = bytes(range(4))
    u, v = bytes([7] * 4), bytes([9] * 4)
    b = b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C444\n" + b"FRAME\n" + y + u + v
    w, h, frames = decode_y4m(b)
    assert (w, h) == (2, 2)
    assert frames.shape == (1, 2, 2)
    assert frames[0].ravel().tolist() == [0, 1, 2, 3]  # Y plane only


def test_y4m_malformed():
    from trace_parquet_spark.operators.multimodal import decode_y4m, encode_y4m

    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"RIFFxxxx")
    good = encode_y4m(np.zeros((2, 2, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated frame"):
        decode_y4m(good[:-1])
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C420jpeg\nFRAME\n" + bytes(6))


# ------------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_image_codecs_roundtrip(h, w, seed):
    """decode(encode(px)) == px for arbitrary dims — including widths
    that exercise every BMP padding residue (w*3 mod 4)."""
    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    assert (decode_image(encode_ppm(px)) == px).all()
    assert (decode_image(encode_bmp(px)) == px).all()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 500),
    ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_wav_roundtrip(n, ch, rate, seed):
    from trace_parquet_spark.operators.multimodal import decode_wav, encode_wav

    s = (
        np.random.RandomState(seed)
        .randint(-32768, 32768, size=(n, ch))
        .astype(np.int16)
    )
    got_rate, got_ch, got = decode_wav(encode_wav(s, rate=rate))
    assert (got_rate, got_ch) == (rate, ch)
    assert (got == s).all()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 8),
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_y4m_roundtrip(n, h, w, seed):
    from trace_parquet_spark.operators.multimodal import decode_y4m, encode_y4m

    frames = (
        np.random.RandomState(seed)
        .randint(0, 256, size=(n, h, w))
        .astype(np.uint8)
    )
    got_w, got_h, got = decode_y4m(encode_y4m(frames))
    assert (got_w, got_h) == (w, h)
    assert got.shape == frames.shape
    assert (got == frames).all()


# ---------------------------------------------------------------- PNG


def test_png_roundtrip_identity_rgb_and_grey():
    """DEFLATE + all five scanline filters must reproduce every pixel;
    heights ≥ 5 force each filter type (encoder uses filter y % 5)."""
    from trace_parquet_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(rgb)), rgb)
    grey = rng.integers(0, 256, size=(8, 13), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(grey)), grey)


def test_png_roundtrip_property_shapes():
    from trace_parquet_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (1, 17), (6, 1), (5, 5), (16, 16), (23, 3)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_png(px)), px), (h, w)


def test_png_gradient_compresses_and_roundtrips():
    """A smooth gradient is the filters' best case — the container
    must come out smaller than the raw raster AND still be lossless
    (compression is real, not a stored block)."""
    from trace_parquet_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    y, x = np.mgrid[0:32, 0:32]
    px = np.stack([(x * 8) % 256, (y * 8) % 256, ((x + y) * 4) % 256], axis=-1)
    px = px.astype(np.uint8)
    blob = encode_png(px)
    assert len(blob) < px.nbytes
    assert np.array_equal(decode_image(blob), px)


def test_png_crc_corruption_rejected():
    from trace_parquet_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    blob = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
    # flip one bit inside the IDAT payload — CRC must catch it
    idat_at = bytes(blob).index(b"IDAT")
    blob[idat_at + 6] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_image(bytes(blob))


def test_png_unsupported_features_rejected():
    import struct
    import zlib

    from trace_parquet_spark.operators.multimodal import _decode_png

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # interlaced (Adam7) flag set
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    with pytest.raises(ValueError, match="non-interlaced"):
        _decode_png(sig + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))
    # palette color type
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    with pytest.raises(ValueError, match="grey/truecolor"):
        _decode_png(sig + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))


# ---------------------------------------------------------------- GIF


def test_gif_roundtrip_identity_full_palette():
    """256-color image exercises the full palette + code-size widening."""
    from trace_parquet_spark.operators.multimodal import encode_gif

    px = np.arange(768, dtype=np.uint8).reshape(16, 16, 3)
    b = encode_gif(px)
    assert b[:6] == b"GIF89a" and b[-1:] == b"\x3b"
    assert (decode_image(b) == px).all()


def test_gif_single_color_and_kwkwk_case():
    from trace_parquet_spark.operators.multimodal import encode_gif

    # single color: degenerate 1-entry palette, long LZW run
    px = np.full((9, 13, 3), 77, dtype=np.uint8)
    assert (decode_image(encode_gif(px)) == px).all()
    # alternating two colors triggers the code==next_code (kwkwk) path
    idx = np.indices((8, 8)).sum(axis=0) % 2
    pal = np.array([[0, 0, 0], [255, 1, 2]], dtype=np.uint8)
    px = pal[idx]
    assert (decode_image(encode_gif(px)) == px).all()


def test_gif_palette_overflow_rejected():
    from trace_parquet_spark.operators.multimodal import encode_gif

    i = np.arange(32 * 32, dtype=np.int64)
    px = np.stack(
        [i % 256, i // 256, np.zeros_like(i)], axis=1
    ).astype(np.uint8).reshape(32, 32, 3)  # 1024 distinct colors
    with pytest.raises(ValueError, match="palette overflow"):
        encode_gif(px)


def test_gif_truncated_stream_rejected():
    from trace_parquet_spark.operators.multimodal import encode_gif

    b = encode_gif(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    with pytest.raises(ValueError):
        decode_image(b[:20] + b"\x00\x3b")


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ncol=st.integers(1, 256),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_gif_roundtrip(h, w, ncol, seed):
    """decode(encode(px)) == px for arbitrary dims and palette sizes —
    every LZW code-size widening point gets exercised across runs."""
    from trace_parquet_spark.operators.multimodal import encode_gif

    rs = np.random.RandomState(seed)
    pal = rs.randint(0, 256, (ncol, 3)).astype(np.uint8)
    px = pal[rs.randint(0, ncol, (h, w))]
    assert (decode_image(encode_gif(px)) == px).all()


# ---------------------------------------------------------------------------
# baseline JPEG (operators/jpeg.py)
# ---------------------------------------------------------------------------

from trace_parquet_spark.operators import jpeg as J  # noqa: E402


def _oracle_quant():
    q = J.QUANT_LUMA.copy()
    q[0] = 8
    return q


def test_jpeg_entropy_stage_is_lossless():
    """Zigzag → DC prediction → magnitude categories → Huffman → byte
    stuffing must round-trip quantized coefficient blocks BIT-EXACT —
    this is the stage that makes a lossy codec deterministic, and it
    covers EOB, ZRL (runs > 15), and every size category the Annex K
    tables define."""
    rs = np.random.RandomState(11)
    # sparse blocks (long zero runs → ZRL/EOB) + a dense block + an
    # all-zero block + extreme DC swings (largest DC categories)
    blocks = (rs.randint(-1000, 1000, (40, 64))
              * (rs.rand(40, 64) < 0.15)).astype(np.int64)
    blocks[7] = rs.randint(-1000, 1000, 64)
    blocks[9] = 0
    blocks[12, 0], blocks[13, 0] = 1016, -1024
    dc = J._build_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac = J._build_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    w = J._BitWriter()
    J._entropy_encode_plane(w, blocks, dc, ac, 0)
    data = w.flush() + b"\xff\xd9"
    out = np.zeros_like(blocks)
    J._entropy_decode_plane(
        J._BitReader(data, 0),
        len(blocks),
        J._build_decode_map(J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        J._build_decode_map(J.AC_LUMA_BITS, J.AC_LUMA_VALS),
        0,
        out,
    )
    assert np.array_equal(blocks, out)


def test_jpeg_constant_blocks_pixel_exact():
    """Constant 8×8 blocks (DC-only spectrum) with DC quantizer 8
    survive the FULL encode→decode chain pixel-exact — the subspace
    the oracle-gated jpeg_decode_roundtrip relies on. Every possible
    byte value must hold, not just a sample."""
    q = _oracle_quant()
    vals = np.arange(256, dtype=np.uint8)
    img = np.repeat(np.repeat(vals.reshape(16, 16), 8, 0), 8, 1)
    out = J.decode_jpeg(J.encode_jpeg(img, quant_luma=q))
    assert out.shape == (128, 128, 1)
    assert np.array_equal(out[..., 0], img)


def test_jpeg_lossy_error_is_quantization_bounded():
    """Arbitrary content with an all-ones quant table loses only the
    per-coefficient rounding (≤ 0.5 each) through the IDCT — a few
    grey levels at most. Distinguishes a working lossy codec from a
    broken one without demanding bit-exactness the format can't give."""
    rs = np.random.RandomState(3)
    q1 = np.ones(64, dtype=np.int64)
    img = rs.randint(0, 256, (24, 32)).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img, quant_luma=q1))
    assert np.abs(out[..., 0].astype(int) - img.astype(int)).max() <= 2
    rgb = rs.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(rgb, quant_luma=q1, quant_chroma=q1))
    # color adds YCbCr round-trip rounding on top of the DCT rounding
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


def test_jpeg_annexk_smooth_content_plausible():
    """Default Annex K (quality-50) tables on smooth content: small
    error, real compression — the behavior profile of an actual JPEG
    encoder, pinned loosely so table regressions surface."""
    y, x = np.mgrid[0:32, 0:32]
    img = np.clip(
        np.round(
            np.stack(
                [120 + 40 * np.sin(x / 6), 90 + 30 * np.cos(y / 5), 100 + x + y],
                -1,
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    payload = J.encode_jpeg(img)
    out = J.decode_jpeg(payload)
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.mean() < 5 and diff.max() < 32
    assert len(payload) < img.size // 2  # actually compresses


def test_jpeg_dispatch_and_marker_structure():
    """decode_image routes on the FFD8 magic; the stream carries the
    JFIF APP0, SOF0, and EOI markers where the spec puts them."""
    img = np.full((8, 8), 77, dtype=np.uint8)
    payload = J.encode_jpeg(img, quant_luma=_oracle_quant())
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    assert payload[2:4] == b"\xff\xe0" and payload[6:11] == b"JFIF\x00"
    assert b"\xff\xc0" in payload  # baseline SOF0
    assert (decode_image(payload) == 77).all()


def test_jpeg_rejects_unsupported_streams():
    img = np.full((8, 8), 10, dtype=np.uint8)
    payload = bytearray(J.encode_jpeg(img))
    # flip SOF0 → SOF2 (progressive)
    i = bytes(payload).index(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        J.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x00\x01\x02")
    # sampling factors outside 1-2 are refused, not mis-decoded
    payload = bytearray(J.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    i = bytes(payload).index(b"\xff\xc0")
    # SOF0 layout: FF C0 len(2) prec h(2) w(2) ncomp, then per-comp
    # (cid, sampling, qid) — Y's sampling byte sits at i+11
    payload[i + 11] = 0x33  # Y sampling 3x3 (not in baseline's 1-2)
    with pytest.raises(ValueError, match="unsupported"):
        J.decode_jpeg(bytes(payload))
    # restored sampling decodes again — the reject was the SOF field
    payload[i + 11] = 0x11
    assert decode_image(bytes(payload)).shape == (8, 8, 3)


@settings(max_examples=10, deadline=None)
@given(
    st.integers(1, 3).map(lambda k: k * 8),
    st.integers(1, 3).map(lambda k: k * 8),
    st.integers(0, 10_000),
)
def test_property_jpeg_block_constant_roundtrip(h, w, seed):
    """Any block-constant grayscale image of any 8-divisible shape is
    exact through the oracle quant table."""
    rs = np.random.RandomState(seed)
    vals = rs.randint(0, 256, (h // 8, w // 8)).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    out = J.decode_jpeg(J.encode_jpeg(img, quant_luma=_oracle_quant()))
    assert np.array_equal(out[..., 0], img)


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 — the standard camera/web layout: MCU interleave (four Y
    blocks then Cb, Cr), box-filtered half-res chroma, replicate
    upsample. On 2×2-constant RGB the chroma path is information-free,
    so 4:2:0 must match 4:4:4 quality; on smooth content it must stay
    within a few grey levels while spending fewer bytes."""
    rs = np.random.RandomState(6)
    q1 = np.ones(64, dtype=np.int64)
    rgb = np.repeat(
        np.repeat(rs.randint(0, 256, (8, 8, 3)), 2, 0), 2, 1
    ).astype(np.uint8)
    out = J.decode_jpeg(
        J.encode_jpeg(rgb, quant_luma=q1, quant_chroma=q1, subsample=True)
    )
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3
    # smooth content, default Annex K tables
    y, x = np.mgrid[0:32, 0:48]
    img = np.clip(
        np.round(
            np.stack(
                [120 + 40 * np.sin(x / 7), 90 + 30 * np.cos(y / 6), 100 + x / 2 + y / 2],
                -1,
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    p420 = J.encode_jpeg(img, subsample=True)
    p444 = J.encode_jpeg(img)
    out = J.decode_jpeg(p420)
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.mean() < 6 and diff.max() < 40
    assert len(p420) < len(p444)  # chroma halving really saves bytes
    # SOF carries 2x2 sampling for Y
    i = p420.index(b"\xff\xc0")
    assert p420[i + 11] == 0x22 and p420[i + 14] == 0x11
    # non-MCU-aligned dims are refused, not mis-encoded
    with pytest.raises(ValueError, match="divisible by 16"):
        J.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), subsample=True)


def test_jpeg_422_decode_supported():
    """4:2:2 streams (2×1 luma sampling) decode through the same
    generalized MCU walk — built by hand-patching the encoder's plane
    prep, proving the decoder is layout-driven, not 420-specific."""
    rs = np.random.RandomState(9)
    # 2x2-constant RGB keeps every chroma layout information-free
    rgb = np.repeat(
        np.repeat(rs.randint(0, 256, (8, 8, 3)), 2, 0), 2, 1
    ).astype(np.uint8)
    q1 = np.ones(64, dtype=np.int64)
    p = J.encode_jpeg(rgb, quant_luma=q1, quant_chroma=q1, subsample=True)
    out = J.decode_jpeg(p)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3
