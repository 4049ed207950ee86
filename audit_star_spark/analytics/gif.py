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


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> np.ndarray:
    """LZW stream -> palette indices (uint8 array, >= max_pixels entries
    when the stream carries them; callers slice to the frame size).

    Vectorized: codes are extracted in bulk per constant-width segment
    (the code width changes only at deterministic table-size boundaries),
    and runs of literal root codes — the only codes the repo's
    dictionary-free encoder ever emits — are appended without touching a
    table. The first code that references a dictionary entry drops the
    rest of the stream to ``_lzw_decode_seq``, which implements the full
    general algorithm with semantics identical to the classic per-code
    loop (same error cases, same truncation behavior)."""
    clear = 1 << min_code_size
    end = clear + 1
    bits = np.unpackbits(np.frombuffer(data, np.uint8), bitorder="little")
    total_bits = len(bits)
    pow2 = 1 << np.arange(12, dtype=np.int64)
    out_parts: list[np.ndarray] = []
    out_len = 0
    code_size = min_code_size + 1
    table_len = end + 1  # virtual len(table); entries materialize lazily
    have_prev = False
    hist_parts: list[np.ndarray] = []  # this block's literal codes
    bitpos = 0
    while bitpos + code_size <= total_bits:
        navail = (total_bits - bitpos) // code_size
        if code_size < 12:
            room = (1 << code_size) - table_len + (0 if have_prev else 1)
        else:
            # width is pinned at the 12-bit ceiling; batch through the
            # point where a width-synchronized encoder must emit its
            # reset clear (table_len == 4096), plus that clear itself —
            # never the whole remaining stream, which would re-extract
            # the tail on every partial consume
            room = max(4096 - table_len, 0) + 1
        k = max(1, min(room, navail))
        seg = bits[bitpos : bitpos + k * code_size]
        codes = seg.reshape(k, code_size).astype(np.int64) @ pow2[:code_size]
        nz = np.flatnonzero(codes >= clear)
        stop = int(nz[0]) if len(nz) else k
        if stop:
            lit = codes[:stop]
            table_len += stop - (0 if have_prev else 1)
            have_prev = True
            out_parts.append(lit.astype(np.uint8))
            hist_parts.append(lit)
            out_len += stop
            bitpos += stop * code_size
            if code_size < 12 and table_len >= (1 << code_size):
                code_size += 1
            if out_len >= max_pixels:
                break
            continue
        v = int(codes[0])
        bitpos += code_size
        if v == end:
            break
        if v == clear:
            code_size = min_code_size + 1
            table_len = end + 1
            have_prev = False
            hist_parts = []
            continue
        if not have_prev:
            # prev is None and v > end => v >= len(table)
            raise ValueError("bad first LZW code")
        # dictionary reference: materialize the block's table from the
        # literal history and finish sequentially (general LZW path)
        hist = np.concatenate(hist_parts)
        table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
        pair_buf = np.empty((len(hist) - 1, 2), dtype=np.uint8)
        pair_buf[:, 0] = hist[:-1]
        pair_buf[:, 1] = hist[1:]
        table.extend(map(bytes, pair_buf))
        tail = _lzw_decode_seq(
            data,
            bitpos - code_size,
            clear,
            end,
            code_size,
            table,
            bytes([int(hist[-1])]),
            max_pixels - out_len,
        )
        out_parts.append(np.frombuffer(tail, dtype=np.uint8))
        out_len += len(tail)
        break
    if not out_parts:
        return np.empty(0, dtype=np.uint8)
    return np.concatenate(out_parts)


def _lzw_decode_seq(
    data: bytes,
    bitpos: int,
    clear: int,
    end: int,
    code_size: int,
    table: list[bytes],
    prev: bytes | None,
    max_pixels: int,
) -> bytes:
    """General sequential LZW continuation (rare path: streams written by
    real dictionary-building encoders). Entries are ``bytes`` so output
    assembly and table growth are C memcpy, not per-int list work."""
    min_code_size = clear.bit_length() - 1
    out = bytearray()
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
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
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
                entry = prev + prev[:1]
            else:
                raise ValueError("bad LZW code")
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        if len(out) >= max_pixels:
            break
        prev = entry
    return bytes(out)


def _lzw_encode(min_code_size: int, indices) -> bytes:
    """Dictionary-free LZW: every pixel as a literal code, widths grown
    in lockstep with the decoder's table, reset before 12-bit overflow.

    Vectorized but byte-identical to the classic emit loop: because every
    code is a literal, the width schedule depends only on the pixel's
    position within its clear-delimited block — the width bumps from cs
    to cs+1 starting at block position (1<<cs) - end, and a clear@12 +
    reset follows every 4096-end-th pixel."""
    clear = 1 << min_code_size
    end = clear + 1
    w0 = min_code_size + 1
    px = np.asarray(indices, dtype=np.int64).ravel()
    n = len(px)
    block = 4096 - end  # pixels per block before the forced clear+reset
    if n < (1 << w0) - end:
        # small input: every code (clear, pixels, end) fits at width w0
        # with no bumps — pack with one broadcast instead of the
        # general masked scatter
        codes = np.empty(n + 2, dtype=np.int64)
        codes[0] = clear
        codes[1:-1] = px
        codes[-1] = end
        bits = ((codes[:, None] >> np.arange(w0)) & 1).astype(np.uint8)
        return np.packbits(bits.ravel(), bitorder="little").tobytes()
    thr = np.array([(1 << cs) - end for cs in range(w0, 12)], dtype=np.int64)
    posin = np.arange(n, dtype=np.int64) % block
    pwidths = w0 + np.searchsorted(thr, posin, side="right")
    n_resets = n // block  # a clear@12 follows every completed block
    total = 1 + n + n_resets + 1
    codes = np.empty(total, dtype=np.int64)
    widths = np.empty(total, dtype=np.int64)
    codes[0] = clear
    widths[0] = w0
    slots = 1 + np.arange(n, dtype=np.int64) + np.arange(n, dtype=np.int64) // block
    codes[slots] = px
    widths[slots] = pwidths
    if n_resets:
        r = np.arange(1, n_resets + 1, dtype=np.int64)
        rs = r * block + r  # immediately after pixel r*block-1
        codes[rs] = clear
        widths[rs] = 12
    codes[-1] = end
    widths[-1] = w0 + int(np.searchsorted(thr, n % block, side="right"))
    offs = np.zeros(total, dtype=np.int64)
    np.cumsum(widths[:-1], out=offs[1:])
    bits = np.zeros(int(offs[-1] + widths[-1]), dtype=np.uint8)
    for b in range(12):
        m = widths > b
        bits[offs[m] + b] = (codes[m] >> b) & 1
    return np.packbits(bits, bitorder="little").tobytes()


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
    data = _lzw_encode(min_code, stored.reshape(-1))
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


# ------------------------------------------------- animation compositing


def parse_gif_frames(payload: bytes) -> list[dict]:
    """Full animated-GIF compositing: every frame's TRUE canvas pixels
    (see ``_parse_gif_frames``). Raises ValueError on truncated/corrupt
    streams — including truncation points that surface as IndexError in
    the block parser — honoring the poison-payload contract."""
    try:
        return _parse_gif_frames(payload)
    except IndexError as exc:
        raise ValueError(f"truncated GIF stream: {exc}") from exc


def _parse_gif_frames(payload: bytes) -> list[dict]:
    """Full animated-GIF compositing: every frame's TRUE canvas pixels,
    honoring Graphic Control Extension disposal methods, frame
    offsets/sizes, and transparency — the animation analog of
    ``parse_avi`` + per-frame decode.

    Per GIF89a: a frame paints its (left, top, w, h) rect over the
    canvas, skipping pixels of the transparent index; after it is
    displayed its disposal method runs — 0/1 leave the canvas, 2
    restores the frame RECT to the background color, 3 restores the
    canvas to its pre-frame state. The canvas starts as the background
    color (the logical-screen descriptor's background index into the
    global color table; zeros if there is no GCT) — the spec reading;
    browsers render it transparent, which RGB output cannot express.

    Returns one dict per frame:
    ``{"frame": HxWx3 uint8 (a fresh copy of the canvas AS DISPLAYED),
    "left", "top", "width", "height", "disposal", "transparent": bool,
    "delay_cs": int}``. Raises ValueError on truncated/corrupt streams
    (mapInPandas callers degrade per the repo contract).
    """
    if payload[:6] not in _GIF_SIGS:
        raise ValueError("bad GIF signature")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    gflags = payload[10]
    bg_index = payload[11]
    gct, pos = _color_table(payload, 13, gflags)
    if gct is not None and bg_index < len(gct):
        bg = gct[bg_index]
    else:
        bg = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = bg
    frames: list[dict] = []
    # GCE state applies to the NEXT image descriptor only
    disposal, transparent_idx, delay_cs = 0, None, 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1] if pos + 1 < len(payload) else 0
            if label == 0xF9 and pos + 7 < len(payload):  # GCE
                flags = payload[pos + 3]
                disposal = (flags >> 2) & 0x07
                delay_cs = int.from_bytes(payload[pos + 4 : pos + 6], "little")
                transparent_idx = payload[pos + 6] if flags & 0x01 else None
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
        table = lct if lct is not None else gct
        if table is None:
            raise ValueError("GIF frame has no color table")
        if top + h > sh or left + w > sw:
            raise ValueError("GIF frame rect exceeds logical screen")
        idx = _lzw_decode(min_code, b"".join(chunks), w * h)
        if len(idx) < w * h:
            raise ValueError("truncated GIF pixel data")
        rows = np.array(idx[: w * h], dtype=np.int32).reshape(h, w)
        if iflags & 0x40:
            rows = _deinterlace(rows)
        if rows.max() >= len(table):
            raise ValueError("GIF index out of palette range")
        saved = canvas.copy() if disposal == 3 else None
        rect = canvas[top : top + h, left : left + w]
        if transparent_idx is not None:
            opaque = rows != transparent_idx
            rect[opaque] = table[rows[opaque]]
        else:
            rect[:, :] = table[rows]
        frames.append(
            {
                "frame": canvas.copy(),
                "left": left,
                "top": top,
                "width": w,
                "height": h,
                "disposal": disposal,
                "transparent": transparent_idx is not None,
                "delay_cs": delay_cs,
            }
        )
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg
        elif disposal == 3:
            canvas = saved
        disposal, transparent_idx, delay_cs = 0, None, 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def encode_gif_animation(
    patches: list[dict],
    screen: tuple[int, int],
    bg_rgb: tuple[int, int, int] = (0, 0, 0),
) -> bytes:
    """Animated-GIF differential test-vector generator. Each patch dict:
    ``img`` (hxwx3 uint8), ``left``/``top`` (default 0), ``disposal``
    (default 0), optional ``mask`` (hxw bool, True = opaque; presence
    adds a GCE transparency flag with a reserved transparent index),
    optional ``delay_cs``. A shared 256-entry global palette is built
    from all patch colors + the background; the background index is 0.

    Deterministic bytes (same LZW writer as ``encode_gif``) so the
    compositing tests can state expected canvases closed-form."""
    sw, sh = screen
    bg_packed = (int(bg_rgb[0]) << 16) | (int(bg_rgb[1]) << 8) | int(bg_rgb[2])
    packed_parts = [np.array([bg_packed], dtype=np.int64)]
    for p in patches:
        img = p["img"]
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError("patch img must be hxwx3")
        mask = p.get("mask")
        flat = img.reshape(-1, 3).astype(np.int64)
        if mask is not None:
            flat = flat[mask.reshape(-1)]
        packed_parts.append((flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2])
    uniq = np.unique(np.concatenate(packed_parts))
    # background first, then the remaining colors in sorted (r, g, b)
    # order — packed-int order IS lexicographic (r, g, b) order
    ordered = [tuple(int(x) for x in bg_rgb)] + [
        (int(c) >> 16, (int(c) >> 8) & 0xFF, int(c) & 0xFF)
        for c in uniq
        if int(c) != bg_packed
    ]
    needs_transparent = any(p.get("mask") is not None for p in patches)
    if len(ordered) + (1 if needs_transparent else 0) > 256:
        raise ValueError("encode_gif_animation supports <= 255 distinct colors")
    transparent_index = len(ordered) if needs_transparent else None
    # vectorized color -> palette index: searchsorted over the packed
    # 24-bit palette (every image color is in `ordered` by construction)
    packed_palette = np.array(
        [(r << 16) | (g << 8) | b for r, g, b in ordered], dtype=np.int64
    )
    order = np.argsort(packed_palette)
    sorted_packed = packed_palette[order]
    palette = np.zeros((256, 3), dtype=np.uint8)
    palette[: len(ordered)] = np.array(ordered, dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += bytes([0x80 | 0x07, 0, 0])  # GCT, 256 entries, bg index 0
    out += palette.tobytes()
    for p in patches:
        img = p["img"]
        h, w = img.shape[:2]
        left, top = int(p.get("left", 0)), int(p.get("top", 0))
        disposal = int(p.get("disposal", 0))
        mask = p.get("mask")
        delay = int(p.get("delay_cs", 0))
        flags = (disposal & 0x07) << 2
        tidx = 0
        if mask is not None:
            flags |= 0x01
            tidx = transparent_index
        out += bytes([0x21, 0xF9, 0x04, flags])
        out += delay.to_bytes(2, "little") + bytes([tidx, 0x00])
        pk = (
            (img[:, :, 0].astype(np.int64) << 16)
            | (img[:, :, 1].astype(np.int64) << 8)
            | img[:, :, 2].astype(np.int64)
        )
        # masked-OUT pixels may carry colors absent from the palette;
        # their lookup result is garbage but immediately overwritten by
        # the transparent index — clip keeps the gather in bounds
        pos = np.clip(
            np.searchsorted(sorted_packed, pk), 0, len(sorted_packed) - 1
        )
        idx = order[pos].astype(np.int32)
        if mask is not None:
            idx = np.where(mask, idx, transparent_index)
        out += b"\x2c" + left.to_bytes(2, "little") + top.to_bytes(2, "little")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0])  # no LCT, no interlace
        min_code = 8
        data = _lzw_encode(min_code, idx.reshape(-1))
        out += bytes([min_code])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
