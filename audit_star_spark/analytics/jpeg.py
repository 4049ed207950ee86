"""Baseline JPEG (JFIF) codec in pure numpy — clears the last multimodal
decode stub (the r02 verdict's item 3). No codec libraries exist in this
environment, and none are needed: baseline sequential JPEG is Huffman
coding + dequantize + 8×8 IDCT + YCbCr→RGB, all expressible in
numpy/stdlib. Everything here derives from the public ITU-T T.81 spec
(marker layout, zigzag, canonical Huffman assignment, Annex-K example
tables) and the public JFIF note (YCbCr matrix).

Scope (honest boundaries, mirroring the PNG decoder's):
- DECODE: baseline sequential DCT (SOF0/1) and progressive DCT (SOF2 —
  spectral selection + successive approximation, T.81 G.2), grayscale or
  3-component YCbCr, any sampling factors (nearest-neighbor chroma
  upsample), interleaved and single-component scans, restart markers.
  Sequential streams decode at 8-bit AND 12-bit precision (Pq=1 16-bit
  quant tables, level shift 2048, uint16 output); progressive remains
  8-bit. Arithmetic coding and hierarchical raise ValueError.
- ENCODE: grayscale or 4:4:4 color, quality-scaled Annex-K quant tables,
  standard Huffman tables — the synthesis side of the differential gate;
  ``encode_jpeg12`` is the 12-bit variant (SOF1, flat Huffman tables
  covering the wider DC/AC categories the Annex-K examples stop short
  of).
  ``encode_jpeg_progressive`` emits a multi-scan SOF2 stream carrying the
  SAME quantized coefficients, so progressive decode is differentially
  locked against baseline decode bit-for-bit at any quality.
  At quality=100 every quant entry is 1, so a constant 8×8 tile is
  DC-only with an EXACT integer coefficient: decode(encode(img)) is
  bit-identical for tile-constant images, which is what makes a
  hash-stable driver-gate oracle possible at all (general images
  round-trip within quantization error, locked by tolerance tests).

The decoder reads quant/Huffman tables from the FILE (DQT/DHT), so its
correctness on foreign baseline JPEGs does not depend on the tables the
encoder happens to ship.
"""

from __future__ import annotations

import numpy as np

# -- 8x8 DCT basis ----------------------------------------------------------
# C[k, n] = c(k) cos((2n+1) k pi / 16); FDCT F = C B C^T, IDCT B = C^T F C.
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(1 / 8) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )

# zigzag scan order, generated (not transcribed) from the diagonal rule
_ZIG: list[tuple[int, int]] = []
for _s in range(15):
    _rng = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in _rng if _s % 2 else reversed(_rng):
        _ZIG.append((_r, _s - _r))
_ZIG_ROWS = np.array([rc[0] for rc in _ZIG])
_ZIG_COLS = np.array([rc[1] for rc in _ZIG])

# -- Annex K example tables (public spec) -----------------------------------
_QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ]
)
_QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ]
)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) under JPEG's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decoder-side view."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# -- bit I/O ----------------------------------------------------------------
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    """Reads entropy-coded bits from an already-unstuffed byte string."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8)).tolist()
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        b = self.bits[self.pos]
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the raw `size`-bit field to a signed int."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _category(value: int) -> int:
    return int(value).bit_length() if value else 0


# -- encoder ----------------------------------------------------------------
def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an example table (public recipe):
    quality 100 clamps every entry to 1, making quantization lossless."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (qt * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int64)


def _encode_block(
    block: np.ndarray,
    qt: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
    bw: _BitWriter,
    center: float = 128.0,
) -> int:
    f = _C @ (block.astype(np.float64) - center) @ _C.T
    q = np.round(f / qt).astype(np.int64)
    zz = q[_ZIG_ROWS, _ZIG_COLS]
    dc = int(zz[0])
    diff = dc - pred
    size = _category(abs(diff))
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        if i > last_nz:
            break
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size = _category(abs(v))
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dqt_seg(tid: int, qt: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tid]) + bytes(int(v) for v in qt[_ZIG_ROWS, _ZIG_COLS]))


def _dht_seg(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """HxWx{1,3} uint8 -> baseline JFIF bytes (grayscale or 4:4:4 color).
    quality=100 → all-ones quant tables → tile-constant images decode
    bit-exactly (the differential-gate synthesis contract)."""
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    qts = [_quality_scale(_QT_LUMA, quality)]
    planes = [img[:, :, 0].astype(np.float64)]
    if c == 3:
        qts.append(_quality_scale(_QT_CHROMA, quality))
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.round(y), np.round(cb), np.round(cr)]
    planes = [np.clip(p, 0, 255) for p in planes]

    head = bytearray(b"\xff\xd8")  # SOI
    head += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += _dqt_seg(0, qts[0])
    if c == 3:
        head += _dqt_seg(1, qts[1])
    comps = b"".join(
        bytes([i + 1, 0x11, 0 if i == 0 else 1]) for i in range(c)
    )  # 4:4:4, comp 1 uses qt 0, comps 2/3 use qt 1
    head += _seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([c]) + comps,
    )
    head += _dht_seg(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    head += _dht_seg(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if c == 3:
        head += _dht_seg(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        head += _dht_seg(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    scomps = b"".join(bytes([i + 1, 0 if i == 0 else 0x11]) for i in range(c))
    head += _seg(0xDA, bytes([c]) + scomps + bytes([0, 63, 0]))

    dc_tabs = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)] + [
        _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ] * (c - 1)
    ac_tabs = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)] + [
        _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    ] * (c - 1)
    bw = _BitWriter()
    preds = [0] * c
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = [
        np.pad(p, ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge") for p in planes
    ]
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(c):  # 4:4:4 interleave = 1 block per comp
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[ci] = _encode_block(
                    block, qts[min(ci, 1)], dc_tabs[ci], ac_tabs[ci], preds[ci], bw
                )
    return bytes(head) + bw.flush() + b"\xff\xd9"  # EOI


def _dqt_seg16(tid: int, qt: np.ndarray) -> bytes:
    """Pq=1 quantization table segment (16-bit entries) — what 12-bit
    precision streams carry."""
    body = bytes([0x10 | tid]) + b"".join(
        int(v).to_bytes(2, "big") for v in qt[_ZIG_ROWS, _ZIG_COLS]
    )
    return _seg(0xDB, body)


# flat canonical tables for the 12-bit encoder: DC categories 0..15 all
# at 5 bits (Kraft 16/32), AC (run,size) for run 0..15 x size 1..15 plus
# EOB and ZRL all at 8 bits (242/256) — valid prefix codes with no
# all-ones code, trivially canonical, covering every symbol a 12-bit
# block can emit (the Annex K example tables stop at category 11).
_DC12_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC12_VALS = list(range(16))
_AC12_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 16)
]
_AC12_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC12_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def encode_jpeg12(img: np.ndarray, quality: int = 90) -> bytes:
    """HxWx{1,3} uint16 (0..4095) -> 12-bit extended sequential (SOF1)
    bytes: Pq=1 16-bit quant tables, level shift 2048, flat Huffman
    tables sized for 12-bit categories. quality=100 clamps quant to 1,
    so tile-constant images decode bit-exactly — the same differential
    contract as the 8-bit encoder."""
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg12 expects 1 or 3 channels")
    if img.min() < 0 or img.max() > 4095:
        raise ValueError("12-bit samples must be in 0..4095")
    center = 2048.0
    qts = [_quality_scale(_QT_LUMA, quality)]
    planes = [img[:, :, 0].astype(np.float64)]
    if c == 3:
        qts.append(_quality_scale(_QT_CHROMA, quality))
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + center
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + center
        planes = [np.round(y), np.round(cb), np.round(cr)]
    planes = [np.clip(p, 0, 4095) for p in planes]

    head = bytearray(b"\xff\xd8")
    head += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += _dqt_seg16(0, qts[0])
    if c == 3:
        head += _dqt_seg16(1, qts[1])
    comps = b"".join(
        bytes([i + 1, 0x11, 0 if i == 0 else 1]) for i in range(c)
    )
    head += _seg(
        0xC1,
        bytes([12]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([c]) + comps,
    )
    head += _dht_seg(0, 0, _DC12_BITS, _DC12_VALS)
    head += _dht_seg(1, 0, _AC12_BITS, _AC12_VALS)
    if c == 3:
        head += _dht_seg(0, 1, _DC12_BITS, _DC12_VALS)
        head += _dht_seg(1, 1, _AC12_BITS, _AC12_VALS)
    scomps = b"".join(bytes([i + 1, 0 if i == 0 else 0x11]) for i in range(c))
    head += _seg(0xDA, bytes([c]) + scomps + bytes([0, 63, 0]))

    dc_codes = _canonical_codes(_DC12_BITS, _DC12_VALS)
    ac_codes = _canonical_codes(_AC12_BITS, _AC12_VALS)
    bw = _BitWriter()
    preds = [0] * c
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = [
        np.pad(p, ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge")
        for p in planes
    ]
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(c):
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[ci] = _encode_block(
                    block, qts[min(ci, 1)], dc_codes, ac_codes, preds[ci],
                    bw, center=center,
                )
    return bytes(head) + bw.flush() + b"\xff\xd9"


# -- decoder ----------------------------------------------------------------
def _unstuff(scan: bytes) -> bytes:
    """Remove 0xFF00 stuffing and RSTn markers; restart handling
    byte-aligns on the markers themselves, so no offsets are kept."""
    out = bytearray()
    i = 0
    while i < len(scan):
        b = scan[i]
        if b == 0xFF:
            nxt = scan[i + 1] if i + 1 < len(scan) else 0xD9
            if nxt == 0x00:
                out.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: byte-aligned state reset
                i += 2
                continue
            break  # next real marker (EOI or next scan) ends the data
        out.append(b)
        i += 1
    return bytes(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> HxWxC uint8 (C = 1 or 3, RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG signature")
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    scans: list[tuple[list, bytes]] = []
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        size = int.from_bytes(payload[i + 2 : i + 4], "big")
        body = payload[i + 4 : i + 2 + size]
        i += 2 + size
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 0xF
                qt = np.zeros((8, 8), dtype=np.int64)
                if prec == 0:
                    qt[_ZIG_ROWS, _ZIG_COLS] = list(body[p + 1 : p + 65])
                    p += 65
                else:  # Pq=1: 16-bit entries (12-bit precision streams)
                    qt[_ZIG_ROWS, _ZIG_COLS] = [
                        int.from_bytes(body[p + 1 + 2 * k : p + 3 + 2 * k], "big")
                        for k in range(64)
                    ]
                    p += 129
                qts[tid] = qt
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tclass, tid = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                (ac_tabs if tclass else dc_tabs)[tid] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 sequential
            prec = body[0]
            if prec not in (8, 12):
                raise ValueError("sequential JPEG precision must be 8 or 12")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for k in range(nc):
                cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {
                "h": h, "w": w, "comps": comps,
                "progressive": False, "prec": prec,
            }
        elif marker == 0xC2:  # SOF2 progressive DCT, Huffman
            prec = body[0]
            if prec != 8:
                raise ValueError("only 8-bit progressive JPEG supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for k in range(nc):
                cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": True}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0/1) and progressive (SOF2) Huffman JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS: header, then entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = []
            for k in range(ns):
                cs, tt = body[1 + 2 * k : 3 + 2 * k]
                sel.append({"cs": cs, "td": tt >> 4, "ta": tt & 0xF})
            # progressive scan parameters: spectral selection Ss..Se and
            # successive approximation Ah (prior) / Al (this scan); for
            # baseline they are fixed at 0, 63, 0, 0
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            scan_data = _unstuff(payload[i:])
            scans.append((sel, (ss, se, ahal >> 4, ahal & 0xF), scan_data))
            # skip past consumed entropy bytes: recompute consumed length
            consumed = 0
            j = i
            while j < len(payload):
                b = payload[j]
                if b == 0xFF and j + 1 < len(payload):
                    nxt = payload[j + 1]
                    if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                        j += 2
                        consumed += 2
                        continue
                    break
                j += 1
                consumed += 1
            i += consumed
        # APPn/COM/other: skipped
    if frame is None or not scans:
        raise ValueError("missing SOF/SOS")

    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        c["w"] = -(-w * c["h"] // hmax)  # ceil
        c["hh"] = -(-h * c["v"] // vmax)
        c["bw"] = -(-c["w"] // 8)
        c["bh"] = -(-c["hh"] // 8)
        c["coef"] = {}

    for sel, (ss, se, ah, al), data in scans:
        br = _BitReader(data)
        active = [next(c for c in comps if c["id"] == s["cs"]) for s in sel]
        preds = {c["id"]: 0 for c in active}
        if frame["progressive"]:
            _decode_progressive_scan(
                br, active, sel, ss, se, ah, al,
                dc_tabs, ac_tabs, restart_interval, w, h, hmax, vmax,
            )
            continue
        if len(active) == 1:
            comp, s = active[0], sel[0]
            nblocks = comp["bw"] * comp["bh"]
            done = 0
            while done < nblocks:
                if restart_interval and done and done % restart_interval == 0:
                    br.pos = (br.pos + 7) // 8 * 8  # byte-align at RST
                    preds = {comp["id"]: 0}
                by, bx = divmod(done, comp["bw"])
                preds[comp["id"]] = _decode_block_into(
                    br, comp, s, by, bx, preds[comp["id"]], dc_tabs, ac_tabs
                )
                done += 1
        else:
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            done = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and done and done % restart_interval == 0:
                        br.pos = (br.pos + 7) // 8 * 8
                        preds = {c["id"]: 0 for c in active}
                    for comp, s in zip(active, sel):
                        for vy in range(comp["v"]):
                            for vx in range(comp["h"]):
                                by = my * comp["v"] + vy
                                bx = mx * comp["h"] + vx
                                preds[comp["id"]] = _decode_block_into(
                                    br, comp, s, by, bx, preds[comp["id"]],
                                    dc_tabs, ac_tabs,
                                )
                    done += 1

    prec = frame.get("prec", 8)
    center = float(1 << (prec - 1))
    maxval = (1 << prec) - 1
    planes = []
    for c in comps:
        qt = qts[c["tq"]]
        nby, nbx = c["bh"], c["bw"]
        coefs = np.zeros((nby * nbx, 8, 8), dtype=np.float64)
        for (by, bx), zz in c["coef"].items():
            if by < nby and bx < nbx:
                blk = np.zeros((8, 8), dtype=np.float64)
                blk[_ZIG_ROWS, _ZIG_COLS] = zz
                coefs[by * nbx + bx] = blk * qt
        # vectorized IDCT over every block at once: B = C^T F C
        spatial = np.einsum("km,bmn,nl->bkl", _C.T, coefs, _C) + center
        plane = (
            spatial.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )[: c["hh"], : c["w"]]
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, hmax // c["h"], axis=1), vmax // c["v"], axis=0
            )
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = planes[0][:, :, None]
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - center)
        g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
        b = y + 1.772 * (cb - center)
        out = np.stack([r, g, b], axis=2)
    else:
        raise ValueError(f"{len(planes)}-component JPEG not supported")
    out = np.clip(np.round(out), 0, maxval)
    return out.astype(np.uint8) if prec == 8 else out.astype(np.uint16)


def _decode_block_into(
    br: _BitReader, comp: dict, s: dict, by: int, bx: int, pred: int,
    dc_tabs: dict, ac_tabs: dict,
) -> int:
    zz = [0] * 64
    t = br.read_symbol(dc_tabs[s["td"]])
    diff = _extend(br.read_bits(t), t) if t else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = br.read_symbol(ac_tabs[s["ta"]])
        r, size = rs >> 4, rs & 0xF
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.read_bits(size), size)
        k += 1
    comp["coef"][(by, bx)] = zz
    return dc


# -- progressive decode (T.81 G.2: spectral selection + successive approx) --
def _block(comp: dict, by: int, bx: int) -> list[int]:
    zz = comp["coef"].get((by, bx))
    if zz is None:
        zz = [0] * 64
        comp["coef"][(by, bx)] = zz
    return zz


def _decode_progressive_scan(
    br: "_BitReader", active: list, sel: list, ss: int, se: int,
    ah: int, al: int, dc_tabs: dict, ac_tabs: dict,
    restart_interval: int, w: int, h: int, hmax: int, vmax: int,
) -> None:
    """One progressive scan. DC scans (Ss=0) may be interleaved; AC scans
    carry exactly one component (T.81 G.1.1.1.1). First scans (Ah=0) code
    point-transformed coefficients; refinement scans (Ah>0) add one bit of
    precision (Al = Ah - 1). Restart markers byte-align and reset both the
    DC predictors and the EOB run."""
    if ss == 0:  # ---------------------------------------------- DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        preds = {c["id"]: 0 for c in active}
        if len(active) == 1:
            comp, s = active[0], sel[0]
            units = [(comp, s, by, bx)
                     for by in range(comp["bh"]) for bx in range(comp["bw"])]
            per_mcu = 1
        else:
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            units = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for comp, s in zip(active, sel):
                        for vy in range(comp["v"]):
                            for vx in range(comp["h"]):
                                units.append(
                                    (comp, s, my * comp["v"] + vy, mx * comp["h"] + vx)
                                )
            per_mcu = sum(c["h"] * c["v"] for c in active)
        mcu_done = 0
        for n, (comp, s, by, bx) in enumerate(units):
            if (restart_interval and n and n % (restart_interval * per_mcu) == 0):
                br.pos = (br.pos + 7) // 8 * 8
                preds = {c["id"]: 0 for c in active}
            zz = _block(comp, by, bx)
            if ah == 0:
                t = br.read_symbol(dc_tabs[s["td"]])
                diff = _extend(br.read_bits(t), t) if t else 0
                preds[comp["id"]] += diff
                zz[0] = preds[comp["id"]] << al
            else:  # refinement: one bit per block
                if br.read_bit():
                    zz[0] |= 1 << al
        del mcu_done
        return
    # --------------------------------------------------------- AC scan
    if len(active) != 1:
        raise ValueError("progressive AC scan must be single-component")
    comp, s = active[0], sel[0]
    tab = ac_tabs[s["ta"]]
    eobrun = 0
    n = 0
    for by in range(comp["bh"]):
        for bx in range(comp["bw"]):
            if restart_interval and n and n % restart_interval == 0:
                br.pos = (br.pos + 7) // 8 * 8
                eobrun = 0
            zz = _block(comp, by, bx)
            if ah == 0:
                eobrun = _dec_ac_first(br, zz, tab, ss, se, al, eobrun)
            else:
                eobrun = _dec_ac_refine(br, zz, tab, ss, se, al, eobrun)
            n += 1


def _dec_ac_first(br, zz, tab, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.read_symbol(tab)
        r, size = rs >> 4, rs & 0xF
        if size == 0:
            if r < 15:  # EOBn: run of 2^r + extra blocks ending here
                eobrun = 1 << r
                if r:
                    eobrun += br.read_bits(r)
                return eobrun - 1  # this block is part of the run
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past end of band")
        zz[k] = _extend(br.read_bits(size), size) << al
        k += 1
    return 0


def _dec_ac_refine(br, zz, tab, ss, se, al, eobrun) -> int:
    """Refinement: newly-nonzero coefficients arrive as sign bits after a
    run over ZERO-HISTORY positions; already-nonzero coefficients consume
    one correction bit each as the run passes over them."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.read_symbol(tab)
            r, size = rs >> 4, rs & 0xF
            newval = 0
            if size == 0:
                if r < 15:  # EOBn
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # ZRL: pass over 16 zero-history positions
            else:
                if size != 1:
                    raise ValueError("refinement size must be 1")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if br.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        # remaining positions of this block: correction bits only
        while k <= se:
            if zz[k] != 0:
                if br.read_bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


# -- progressive encoder (the synthesis side of the differential gate) ------
# A flat 256-symbol AC table: the standard baseline tables lack the EOBn
# (r<<4, r>0) symbols progressive scans emit, and building optimal tables
# is beside the point for a test-vector generator. 255 codes of length 8
# plus one of length 9 is a valid canonical set (Kraft sum 255/256+1/512).
_AC_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
_AC_FLAT_VALS = list(range(256))


class _EobState:
    """Cross-block EOB-run + buffered-correction-bit state for one scan."""

    def __init__(self, bw: "_BitWriter", ac_codes: dict) -> None:
        self.bw = bw
        self.ac = ac_codes
        self.eobrun = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.ac[nbits << 4]
            self.bw.write(code, ln)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.bits:
            self.bw.write(b, 1)
        self.bits = []

    def add_block(self, pending: list[int]) -> None:
        self.eobrun += 1
        self.bits.extend(pending)
        if self.eobrun == 0x7FFF:
            self.flush()


def _enc_ac_first_block(zz, ss, se, al, st: _EobState) -> None:
    r = 0
    wrote = False
    for k in range(ss, se + 1):
        t = abs(zz[k]) >> al
        if t == 0:
            r += 1
            continue
        st.flush()
        while r > 15:
            code, ln = st.ac[0xF0]
            st.bw.write(code, ln)
            r -= 16
        size = _category(t)
        code, ln = st.ac[(r << 4) | size]
        st.bw.write(code, ln)
        v = t if zz[k] > 0 else -t
        st.bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        r = 0
        wrote = True
    if r > 0 or not wrote:
        st.add_block([])


def _enc_ac_refine_block(zz, ss, se, al, st: _EobState) -> None:
    absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
    last_new = -1
    for idx, t in enumerate(absv):
        if t == 1:
            last_new = idx
    r = 0
    pending: list[int] = []
    for idx, t in enumerate(absv):
        k = ss + idx
        if t == 0:
            r += 1
            continue
        # ZRLs must be emitted on arrival at ANY nonzero-history coefficient
        # once >15 zero-history positions are pending (T.81 G.1.2.3 /
        # libjpeg jcphuff.c encode_mcu_AC_refine): the decoder's ZRL advance
        # stops at the 16th zero and consumes correction bits only for the
        # nonzero coefficients it actually passes, so deferring the ZRL to
        # the next newly-nonzero position desynchronizes the stream.
        # Emitting here keeps the invariant that every buffered correction
        # bit belongs to a coefficient inside the next ZRL's 16-zero span,
        # which is what makes the flush-all-after-ZRL below correct.
        # Beyond the last newly-nonzero coefficient the zeros fold into the
        # EOB run instead (idx <= last_new guard).
        while r > 15 and idx <= last_new:
            st.flush()
            code, ln = st.ac[0xF0]
            st.bw.write(code, ln)
            r -= 16
            for b in pending:
                st.bw.write(b, 1)
            pending = []
        if t > 1:  # previously nonzero: correction bit rides behind
            pending.append(t & 1)
            continue
        # newly nonzero (t == 1); idx <= last_new by construction
        st.flush()
        code, ln = st.ac[(r << 4) | 1]
        st.bw.write(code, ln)
        st.bw.write(1 if zz[k] > 0 else 0, 1)
        for b in pending:
            st.bw.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending or last_new < 0:
        st.add_block(pending)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90) -> bytes:
    """HxWx{1,3} uint8 -> progressive (SOF2) JFIF bytes, exercising every
    progressive decode path: an interleaved successive-approximation DC
    scan + DC refinement, then per-component spectral-selection AC bands
    at Al=1 with a full refinement pass to Al=0. Coefficients after all
    scans equal the baseline encoder's exactly, so at quality=100
    decode(progressive) == decode(baseline) bit-for-bit — the
    differential contract the tests lock."""
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg_progressive expects 1 or 3 channels")
    qts = [_quality_scale(_QT_LUMA, quality)]
    planes = [img[:, :, 0].astype(np.float64)]
    if c == 3:
        qts.append(_quality_scale(_QT_CHROMA, quality))
        r_, g_, b_ = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
        planes = [np.round(y), np.round(cb), np.round(cr)]
    planes = [np.clip(p, 0, 255) for p in planes]

    # quantized coefficient blocks per component, zigzag order
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    blocks: list[list[list[int]]] = []
    for ci, p in enumerate(planes):
        padded = np.pad(p, ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge")
        comp_blocks = []
        qt = qts[min(ci, 1)]
        for by in range(bh):
            for bx in range(bwid):
                blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                f = _C @ (blk - 128.0) @ _C.T
                q = np.round(f / qt).astype(np.int64)
                comp_blocks.append([int(v) for v in q[_ZIG_ROWS, _ZIG_COLS]])
        blocks.append(comp_blocks)

    head = bytearray(b"\xff\xd8")
    head += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += _dqt_seg(0, qts[0])
    if c == 3:
        head += _dqt_seg(1, qts[1])
    comps = b"".join(bytes([i + 1, 0x11, 0 if i == 0 else 1]) for i in range(c))
    head += _seg(
        0xC2,  # SOF2
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([c]) + comps,
    )
    head += _dht_seg(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    head += _dht_seg(1, 0, _AC_FLAT_BITS, _AC_FLAT_VALS)
    if c == 3:
        head += _dht_seg(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)

    dc_codes = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)] + [
        _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ] * (c - 1)
    ac_codes = _canonical_codes(_AC_FLAT_BITS, _AC_FLAT_VALS)
    out = bytearray(head)

    def sos(comp_ids_tabs: list[tuple[int, int, int]], ss, se, ah, al) -> bytearray:
        body = bytes([len(comp_ids_tabs)])
        for cid, td, ta in comp_ids_tabs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return bytearray(_seg(0xDA, body))

    # scan 1: interleaved DC first, Al=1
    out += sos([(i + 1, min(i, 1), 0) for i in range(c)], 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * c
    for n in range(bh * bwid):  # 4:4:4 -> MCU = one block per component
        for ci in range(c):
            dc = blocks[ci][n][0] >> 1  # point transform Al=1
            diff = dc - preds[ci]
            preds[ci] = dc
            size = _category(abs(diff))
            code, ln = dc_codes[ci][size]
            bw.write(code, ln)
            if size:
                bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    out += bw.flush()

    # scan 2: DC refinement to Al=0
    out += sos([(i + 1, min(i, 1), 0) for i in range(c)], 0, 0, 1, 0)
    bw = _BitWriter()
    for n in range(bh * bwid):
        for ci in range(c):
            bw.write(blocks[ci][n][0] & 1, 1)
    out += bw.flush()

    # per component: AC bands at Al=1, then one refinement pass to Al=0
    for ci in range(c):
        for ss, se in ((1, 5), (6, 63)):
            out += sos([(ci + 1, 0, 0)], ss, se, 0, 1)
            bw = _BitWriter()
            st = _EobState(bw, ac_codes)
            for n in range(bh * bwid):
                _enc_ac_first_block(blocks[ci][n], ss, se, 1, st)
            st.flush()
            out += bw.flush()
        out += sos([(ci + 1, 0, 0)], 1, 63, 1, 0)
        bw = _BitWriter()
        st = _EobState(bw, ac_codes)
        for n in range(bh * bwid):
            _enc_ac_refine_block(blocks[ci][n], 1, 63, 0, st)
        st.flush()
        out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)
