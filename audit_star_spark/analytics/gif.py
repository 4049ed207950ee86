"""GIF87a/89a codec — pure stdlib/numpy, no imaging libraries.

The remaining big web-image format after netpbm/BMP/PNG/JPEG: GIF's
"entropy coding" is LZW with variable code width (3-12 bits), which is
~80 lines of Python. Decode covers global AND local color tables, the
4-pass interlace, 89a extension blocks (skipped), and multi-frame files
(first frame returned, frame count surfaced); truncated streams raise
ValueError so the mapInPandas callers degrade per the repo contract.

The encoder is the classic dictionary-free LZW writer (literal codes
with decoder-synchronized width growth and resets) — deterministic
bytes, used as the differential test-vector generator exactly like
``encode_jpeg_progressive`` and ``encode_avi_mjpeg``.

Public spec: GIF89a specification (CompuServe 1990, via W3C mirror).
"""

from __future__ import annotations

import numpy as np

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while True:
        if bitpos + code_size > total_bits:
            break  # stream ended without END code: keep what we have
        v = 0
        for i in range(code_size):
            v |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) << i
        bitpos += code_size
        if v == end:
            break
        if v == clear:
            code_size = min_code_size + 1
            table = [[i] for i in range(clear)] + [[], []]
            prev = None
            continue
        if prev is None:
            if v >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[v]
        else:
            if v < len(table):
                entry = table[v]
            elif v == len(table):
                entry = prev + [prev[0]]
            else:
                raise ValueError("bad LZW code")
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        out.extend(entry)
        if len(out) >= max_pixels:
            break
        prev = entry
    return out


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """Dictionary-free LZW: every pixel as a literal code, widths grown
    in lockstep with the decoder's table, reset before 12-bit overflow."""
    clear = 1 << min_code_size
    end = clear + 1
    bits: list[int] = []

    def emit(code: int, size: int) -> None:
        for i in range(size):
            bits.append((code >> i) & 1)

    code_size = min_code_size + 1
    emit(clear, code_size)
    next_code = end + 1
    first = True  # decoder adds NO table entry for the first code after
    for px in indices:  # a clear — count from the second one
        emit(px, code_size)
        if first:
            first = False
            continue
        next_code += 1
        if next_code == (1 << code_size):
            if code_size < 12:
                code_size += 1
            else:
                emit(clear, code_size)
                code_size = min_code_size + 1
                next_code = end + 1
                first = True
    emit(end, code_size)
    by = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            b |= bit << j
        by.append(b)
    return bytes(by)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _color_table(data: bytes, pos: int, flags: int) -> tuple[np.ndarray | None, int]:
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        tbl = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        return tbl, pos + n * 3
    return None, pos


def parse_gif(payload: bytes) -> tuple[np.ndarray, int]:
    """GIF bytes -> (first frame HxWx3 uint8, total frame count)."""
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("bad GIF signature")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    gflags = payload[10]
    gct, pos = _color_table(payload, 13, gflags)
    first: np.ndarray | None = None
    n_frames = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left = int.from_bytes(payload[pos + 1 : pos + 3], "little")
        top = int.from_bytes(payload[pos + 3 : pos + 5], "little")
        w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        iflags = payload[pos + 9]
        pos += 10
        lct, pos = _color_table(payload, pos, iflags)
        min_code = payload[pos]
        pos += 1
        chunks = []
        while pos < len(payload) and payload[pos] != 0:
            n = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + n])
            pos += 1 + n
        pos += 1  # block terminator
        n_frames += 1
        if first is None:
            table = lct if lct is not None else gct
            if table is None:
                raise ValueError("GIF frame has no color table")
            idx = _lzw_decode(min_code, b"".join(chunks), w * h)
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            rows = np.array(idx[: w * h], dtype=np.int32).reshape(h, w)
            if iflags & 0x40:
                rows = _deinterlace(rows)
            if rows.max() >= len(table):
                raise ValueError("GIF index out of palette range")
            frame = np.zeros((sh, sw, 3), dtype=np.uint8)
            frame[top : top + h, left : left + w] = table[rows]
            first = frame
    if first is None:
        raise ValueError("GIF contains no image data")
    return first, n_frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame as HxWx3 uint8 (palette applied)."""
    return parse_gif(payload)[0]


def encode_gif(
    img: np.ndarray, interlace: bool = False, n_frames: int = 1
) -> bytes:
    """HxWx{1,3} uint8 -> GIF89a bytes. Grayscale uses the identity
    256-entry palette; RGB images must use <= 256 distinct colors (a
    palette is built from them). ``n_frames`` repeats the same frame —
    the multi-frame structure without animation extensions."""
    h, w, c = img.shape
    if c == 1:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        idx = img[:, :, 0].astype(np.int32)
    elif c == 3:
        flat = img.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("encode_gif supports <= 256 distinct colors")
        palette = np.zeros((256, 3), dtype=np.uint8)
        palette[: len(colors)] = colors
        idx = inverse.astype(np.int32).reshape(h, w)
    else:
        raise ValueError("encode_gif expects 1 or 3 channels")
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | 0x07, 0, 0])  # global table, 256 entries
    out += palette.tobytes()
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        stored = idx[order]
    else:
        stored = idx
    min_code = 8
    data = _lzw_encode(min_code, [int(v) for v in stored.reshape(-1)])
    for _ in range(n_frames):
        out += b"\x2c" + (0).to_bytes(2, "little") * 2
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0])
        out += bytes([min_code])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
