"""Baseline JPEG (ITU-T T.81) codec in pure numpy + stdlib.

Closes the last documented magic-bytes stub in the multimodal seam
(multimodal.py historically listed JPEG as a branch a codec library
would fill): ``encode_jpeg``/``decode_jpeg`` implement baseline
sequential DCT, 8-bit precision, Huffman entropy coding, grayscale or
4:4:4 YCbCr color, with the public Annex K quantization and Huffman
tables as defaults. Everything derives from the published spec — no
codec library, no third-party code.

Supported on decode: SOI/APP0(JFIF)/APPn/COM/DQT (8-bit)/SOF0 (1 or 3
components, 1×1 sampling)/DHT/DRI=0/SOS/EOI, 0xFF00 byte unstuffing.
Progressive (SOF2), arithmetic coding, 16-bit quant tables, subsampled
chroma and restart markers raise a clear error — this is a baseline
codec, stated as such.

Exactness notes (what the tests pin):
- the entropy stage (zigzag → DC prediction → magnitude categories →
  Huffman → byte stuffing) is LOSSLESS: quantized coefficient blocks
  round-trip bit-exact (tests/test_image_codec.py);
- an 8×8-constant-value grayscale block survives the full encode →
  decode chain pixel-exact when the DC quantizer divides 8·(v−128)
  exactly (DC-only spectrum; used by the oracle-gated
  ``jpeg_decode_roundtrip`` with q_DC = 8);
- arbitrary content round-trips within the quantization error bound
  (≤ ~half a step per coefficient through the IDCT), asserted
  empirically in the tests.

Reference: no counterpart in /root/reference (single-query trace-export
engine); north-star multimodal extension alongside PNG/GIF/WAV/Y4M.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# constant tables (ITU-T T.81 Annex K — public spec)
# --------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

#: Annex K.1 luminance / K.2 chrominance quantization tables (quality
#: 50), in NATURAL (row-major) order.
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix with JPEG normalization:
# S = _C @ B @ _C.T  is the T.81 FDCT;  B = _C.T @ S @ _C  the IDCT
_k = np.arange(8).reshape(-1, 1)
_n = np.arange(8).reshape(1, -1)
_C = np.cos((2 * _n + 1) * _k * np.pi / 16) / 2.0
_C[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
del _k, _n


# --------------------------------------------------------------------------
# Huffman machinery (canonical codes from a (bits, values) spec)
# --------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the table-driven decoder."""
    return {
        (length, code): sym for sym, (code, length) in _build_codes(bits, vals).items()
    }


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (FF → FF 00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing;
    stops (raises EOFError) at any real marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data) - 1:
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise EOFError("marker in entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: value -> (size category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --------------------------------------------------------------------------
# block transforms
# --------------------------------------------------------------------------


def _fdct_quant(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Plane (H×W, multiple of 8) → quantized coefficient blocks
    (n_blocks, 64) in natural order, row-major block order."""
    h, w = plane.shape
    shifted = plane.astype(np.float64) - 128.0
    blocks = (
        shifted.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    coefs = np.einsum("ux,bxy,vy->buv", _C, blocks, _C)
    q = quant.reshape(8, 8).astype(np.float64)
    # T.81 divides and rounds to nearest (F.1.1.4)
    return np.round(coefs / q).astype(np.int64).reshape(-1, 64)


def _dequant_idct(blocks: np.ndarray, quant: np.ndarray, h: int, w: int) -> np.ndarray:
    """Quantized blocks (n, 64 natural order) → uint8 plane H×W."""
    coefs = (blocks.reshape(-1, 8, 8) * quant.reshape(8, 8)).astype(np.float64)
    spatial = np.einsum("xu,buv,yv->bxy", _C.T, coefs, _C.T)
    plane = (
        spatial.reshape(h // 8, w // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )
    return np.clip(np.round(plane + 128.0), 0, 255).astype(np.uint8)


def _entropy_encode_plane(
    writer: _BitWriter,
    blocks: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    """Encode natural-order quantized blocks; returns the new DC
    predictor. Lossless stage — pinned coefficient-exact in tests."""
    for blk in blocks:
        zz = blk[ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        size, bits = _magnitude(diff)
        code, length = dc_codes[size]
        writer.write(code, length)
        if size:
            writer.write(bits, size)
        run = 0
        last_nz = np.nonzero(zz[1:])[0]
        end = (last_nz[-1] + 2) if len(last_nz) else 1
        for k in range(1, end):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            size, bits = _magnitude(v)
            if size > 10:
                # Annex K AC tables stop at size 10; only reachable
                # with a quant table near 1 on adversarial content
                raise ValueError(
                    f"AC coefficient {v} too large for the AC Huffman "
                    "table — raise the quantization table values"
                )
            code, length = ac_codes[(run << 4) | size]
            writer.write(code, length)
            writer.write(bits, size)
            run = 0
        if end < 64:
            code, length = ac_codes[0x00]  # EOB
            writer.write(code, length)
    return pred


def _entropy_decode_plane(
    reader: _BitReader,
    n_blocks: int,
    dc_map: dict[tuple[int, int], int],
    ac_map: dict[tuple[int, int], int],
    pred: int,
    out: np.ndarray,
) -> int:
    """Decode ``n_blocks`` blocks into ``out`` (natural order)."""
    for b in range(n_blocks):
        zz = np.zeros(64, dtype=np.int64)
        size = reader.read_symbol(dc_map)
        pred += _extend(reader.read_bits(size), size)
        zz[0] = pred
        k = 1
        while k < 64:
            sym = reader.read_symbol(ac_map)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run != 15:
                    raise ValueError(f"invalid AC symbol {sym:#x}")
                k += 16  # ZRL
                continue
            k += run
            if k >= 64:
                raise ValueError("AC run past block end")
            zz[k] = _extend(reader.read_bits(size), size)
            k += 1
        out[b] = zz[_UNZIGZAG]
    return pred


# --------------------------------------------------------------------------
# color conversion (JFIF)
# --------------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    y = planes[..., 0].astype(np.float64)
    cb = planes[..., 1].astype(np.float64) - 128.0
    cr = planes[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def _dqt_segment(tid: int, quant: np.ndarray) -> bytes:
    return _marker(
        0xDB, bytes([tid]) + bytes(int(v) for v in quant[ZIGZAG])
    )


def _dht_segment(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return _marker(
        0xC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    )


def _box2(plane: np.ndarray) -> np.ndarray:
    """2×2 box-average downsample (the standard 4:2:0 chroma filter),
    rounded to the uint8 grid."""
    h, w = plane.shape
    p = plane.astype(np.float64).reshape(h // 2, 2, w // 2, 2)
    return np.clip(np.round(p.mean(axis=(1, 3))), 0, 255).astype(np.uint8)


def _mcu_block_order(
    comp_dims: list[tuple[int, int]], samp: list[tuple[int, int]]
) -> list[list[int]]:
    """Per-component list of block indices in MCU interleave order:
    for each MCU (raster), component c contributes v_c×h_c blocks of
    its own block grid (T.81 A.2.3). comp_dims are (rows, cols) of
    each component's 8×8-block grid. MCU grid derived from the first
    (max-sampled) component: rows/v₀ × cols/h₀."""
    mcu_rows = comp_dims[0][0] // samp[0][1]
    mcu_cols = comp_dims[0][1] // samp[0][0]
    order: list[list[int]] = [[] for _ in comp_dims]
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for c, ((_rows, cols), (hc, vc)) in enumerate(zip(comp_dims, samp)):
                for v in range(vc):
                    for hh in range(hc):
                        order[c].append((my * vc + v) * cols + (mx * hc + hh))
    return order


def encode_jpeg(
    px: np.ndarray,
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
    subsample: bool = False,
) -> bytes:
    """Baseline JFIF encode of an H×W (grayscale) or H×W×3 (RGB)
    uint8 array. ``subsample=True`` emits 4:2:0 (2×2 luma sampling,
    box-filtered half-resolution chroma — the standard camera/web
    layout); default is 4:4:4. H and W must be multiples of the MCU
    size (8, or 16 when subsampling) — this codec does not pad
    partial MCUs (the corpus renders full blocks)."""
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[..., 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    mcu = 16 if (subsample and not gray) else 8
    if h % mcu or w % mcu:
        raise ValueError(f"encode_jpeg requires dimensions divisible by {mcu}")
    qy = QUANT_LUMA if quant_luma is None else np.asarray(quant_luma, dtype=np.int64)
    qc = QUANT_CHROMA if quant_chroma is None else np.asarray(quant_chroma, dtype=np.int64)

    if gray:
        samp = [(1, 1)]
        planes = [px]
        quants = [qy]
    else:
        ycc = _rgb_to_ycbcr(px)
        if subsample:
            samp = [(2, 2), (1, 1), (1, 1)]
            planes = [ycc[..., 0], _box2(ycc[..., 1]), _box2(ycc[..., 2])]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
            planes = [ycc[..., i] for i in range(3)]
        quants = [qy, qc, qc]
    ncomp = len(planes)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_segment(0, qy)
    if not gray:
        out += _dqt_segment(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hc, vc = samp[cid - 1]
        sof += bytes([cid, (hc << 4) | vc, 0 if cid == 1 else 1])
    out += _marker(0xC0, sof)  # SOF0: baseline sequential DCT
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    dc_tabs = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_tabs = [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        dc_tabs.append(_build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_tabs.append(_build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))
    comp_blocks = [
        _fdct_quant(p, q) for p, q in zip(planes, quants)
    ]
    comp_dims = [(p.shape[0] // 8, p.shape[1] // 8) for p in planes]
    order = _mcu_block_order(comp_dims, samp)
    writer = _BitWriter()
    preds = [0] * ncomp
    n_per_mcu = [hc * vc for hc, vc in samp]
    n_mcus = len(order[0]) // n_per_mcu[0]
    cursor = [0] * ncomp
    for _ in range(n_mcus):
        for c in range(ncomp):
            t = 0 if c == 0 else 1
            for _ in range(n_per_mcu[c]):
                bi = order[c][cursor[c]]
                cursor[c] += 1
                preds[c] = _entropy_encode_plane(
                    writer,
                    comp_blocks[c][bi : bi + 1],
                    dc_tabs[t],
                    ac_tabs[t],
                    preds[c],
                )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to H×W×C uint8 (C = 1 or 3;
    color output is RGB). Supports 4:4:4 and subsampled chroma
    (4:2:0 / 4:2:2 / 4:4:0 — any h,v ∈ {1,2} per component; chroma is
    upsampled by pixel replication). Raises ValueError for
    progressive/arithmetic/16-bit-quant streams and for dimensions
    that are not whole MCUs (unpadded codec)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict[tuple[int, int], int]] = {}
    ac_maps: dict[int, dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    samp: list[tuple[int, int]] = []  # (h_c, v_c) sampling factors
    scan: list[tuple[int, int, int]] = []  # (comp idx, dc table, ac table)

    while True:
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while b[pos + 1] == 0xFF:  # optional fill bytes (T.81 B.1.1.2)
            pos += 1
        tag = b[pos + 1]
        pos += 2
        if tag == 0xD9:  # EOI before scan — empty image
            raise ValueError("EOI before SOS")
        (seglen,) = struct.unpack_from(">H", b, pos)
        seg = b[pos + 2 : pos + seglen]
        pos += seglen
        if tag == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(seg):
                pq, tid = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = np.frombuffer(seg[off + 1 : off + 65], dtype=np.uint8)
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = zz
                quants[tid] = q
                off += 65
        elif tag == 0xC4:  # DHT (possibly several tables per segment)
            off = 0
            while off < len(seg):
                tclass, tid = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                nval = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nval])
                m = _build_decode_map(bits, vals)
                (dc_maps if tclass == 0 else ac_maps)[tid] = m
                off += 17 + nval
        elif tag == 0xC0 or tag == 0xC1:  # SOF0/1: baseline ok
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            for c in range(ncomp):
                cid, sampling, qid = seg[6 + 3 * c : 9 + 3 * c]
                hc, vc = sampling >> 4, sampling & 0x0F
                if not (1 <= hc <= 2 and 1 <= vc <= 2):
                    raise ValueError(
                        f"sampling factors {hc}x{vc} unsupported (1-2 only)"
                    )
                comps.append((cid, qid))
                samp.append((hc, vc))
        elif tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker {tag:#x}) unsupported"
            )
        elif tag == 0xDD:  # DRI
            (interval,) = struct.unpack_from(">H", seg, 0)
            if interval != 0:
                raise ValueError("restart intervals unsupported")
        elif tag == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            for s in range(ns):
                cid, tabs = seg[1 + 2 * s], seg[2 + 2 * s]
                idx = next(
                    i for i, (c, _) in enumerate(comps) if c == cid
                )
                scan.append((idx, tabs >> 4, tabs & 0x0F))
            break
        # APPn/COM/etc.: skipped

    if not comps:
        raise ValueError("missing SOF")
    hmax = max(hc for hc, _ in samp)
    vmax = max(vc for _, vc in samp)
    if h % (8 * vmax) or w % (8 * hmax):
        raise ValueError(
            f"dimensions must be whole MCUs ({8 * hmax}x{8 * vmax}; "
            "unpadded codec)"
        )
    # per-component plane dims (T.81 A.1.1: scaled by h_c/hmax, v_c/vmax)
    comp_hw = [
        (h * vc // vmax, w * hc // hmax) for hc, vc in samp
    ]
    comp_dims = [(ch // 8, cw // 8) for ch, cw in comp_hw]
    order = _mcu_block_order(
        [comp_dims[i] for i, _ in enumerate(comps)], samp
    ) if samp[0] == (hmax, vmax) else None
    if order is None:
        raise ValueError("first component must carry the max sampling")
    blocks = [
        np.zeros((rows * cols, 64), dtype=np.int64)
        for rows, cols in comp_dims
    ]
    reader = _BitReader(b, pos)
    preds = [0] * len(comps)
    n_per_mcu = {i: samp[i][0] * samp[i][1] for i, _, _ in scan}
    n_mcus = len(order[0]) // (samp[0][0] * samp[0][1])
    cursor = [0] * len(comps)
    for _ in range(n_mcus):
        for idx, dct, act in scan:
            for _ in range(n_per_mcu[idx]):
                bi = order[idx][cursor[idx]]
                cursor[idx] += 1
                preds[idx] = _entropy_decode_plane(
                    reader,
                    1,
                    dc_maps[dct],
                    ac_maps[act],
                    preds[idx],
                    blocks[idx][bi : bi + 1],
                )
    planes = []
    for i, (_, qid) in enumerate(comps):
        ch, cw = comp_hw[i]
        p = _dequant_idct(blocks[i], quants[qid], ch, cw)
        hc, vc = samp[i]
        if (hc, vc) != (hmax, vmax):  # replicate-upsample chroma
            p = np.repeat(np.repeat(p, vmax // vc, axis=0), hmax // hc, axis=1)
        planes.append(p)
    if len(planes) == 1:
        return planes[0][..., None]
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
