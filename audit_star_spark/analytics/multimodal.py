"""Multimodal column handling (north-star layer): images/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
pandas functions over ``mapInPandas``.

Decode is REAL, with no codec libraries: netpbm P5/P6 (PGM/PPM),
uncompressed 8/24-bit BMP, 8-bit non-interlaced PNG (stdlib-zlib inflate
+ all five scanline filters), baseline AND progressive JPEG (pure-numpy
Huffman + dequant + IDCT + YCbCr, analytics/jpeg.py), RIFF/WAVE 16-bit
PCM audio, and RIFF/AVI MJPEG video (container chunk walk + per-frame
JPEG decode). Arithmetic/12-bit JPEG and other containers raise
honestly; the Spark-side plumbing is format-agnostic either way. On
top: nearest-neighbor resize, image/audio/video metadata, perceptual
average-hash + near-dup pairs, an audio energy-contour fingerprint, and
real sampled-frame statistics.

Scale notes: mapInPandas is narrow (no shuffle); batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch so executor memory is
independent of partition size. Binary payloads stay off the driver.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("head_mean", T.DoubleType()),
    ]
)


def _parse_netpbm(payload: bytes) -> np.ndarray:
    """P5 (grayscale) / P6 (RGB) binary netpbm -> HxWxC uint8."""
    # header = magic, width, height, maxval as whitespace-separated tokens
    # ('#' comments run to end-of-line), then one raw raster
    tokens: list[bytes] = []
    i = 2  # past magic
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 3 if payload[:2] == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels, offset=i)
    return arr.reshape(h, w, channels)


def _parse_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) 8-bit-paletted / 24-bit BMP -> HxWxC uint8."""
    if int.from_bytes(payload[30:34], "little") != 0:
        raise ValueError("compressed BMP not supported")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    top_down, h = h < 0, abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3  # rows pad to 4 bytes
    raster = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=off)
    rows = raster.reshape(h, row_bytes)
    if bpp == 24:
        img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    elif bpp == 8:
        hdr_size = int.from_bytes(payload[14:18], "little")
        n_colors = int.from_bytes(payload[46:50], "little") or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRA entries -> RGB
        img = pal[rows[:, :w]]
    else:
        raise ValueError(f"{bpp}-bpp BMP not supported")
    return np.ascontiguousarray(img if top_down else img[::-1])


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(data: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Invert PNG scanline filtering (spec §9): each scanline is prefixed
    by a filter-type byte. None/Up vectorize over the whole line. Sub is
    a per-lane prefix sum — mod 256 commutes with addition, so cumsum %
    256 IS the recurrence (measured 31× over the r02 per-byte loop at
    256×256 RGB). Average/Paeth are genuinely sequential (floor division
    and the Paeth tie-break are nonlinear in the unwrapped sums); the
    recurrence runs over plain Python ints on lists — numpy scalar
    indexing in the hot loop is what made the r02 version slow (measured:
    list loop 31/60 ms vs numpy-indexed 135/161 ms vs channel-lane
    vectorized 270/599 ms — tiny-array numpy ops lose to scalar ints).
    Worst-case cost bound: ~1 µs/byte for an all-Paeth image; decode
    stays narrow (mapInPandas) so cores scale it linearly."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    raw = np.frombuffer(data, dtype=np.uint8)
    for y in range(h):
        f = int(raw[y * (stride + 1)])
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        prior = out[y - 1] if y > 0 else np.zeros(stride, np.uint8)
        if f == 0:
            out[y] = line
        elif f == 2:
            out[y] = (line.astype(np.int32) + prior) % 256
        elif f == 1:
            out[y] = (
                np.cumsum(line.reshape(w, bpp), axis=0, dtype=np.int64) % 256
            ).reshape(stride)
        elif f == 3:
            ln, pr = line.tolist(), prior.tolist()
            rec = [0] * stride
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                rec[i] = (ln[i] + ((a + pr[i]) >> 1)) & 255
            out[y] = rec
        elif f == 4:
            ln, pr = line.tolist(), prior.tolist()
            rec = [0] * stride
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = pr[i]
                c = pr[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (ln[i] + pred) & 255
            out[y] = rec
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out


def _parse_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG (gray / RGB / palette / RGBA) -> HxWxC
    uint8. Real decode: chunk walk, stdlib-zlib inflate of the IDAT
    stream, and full five-filter scanline reconstruction — PNG's
    "entropy coding" is DEFLATE, which ships with Python, unlike JPEG's
    DCT pipeline."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos, ihdr, idat, plte = len(_PNG_SIG), None, b"", None
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, interlace = ihdr[8], ihdr[9], ihdr[12]
    if depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    pixels = _png_unfilter(zlib.decompress(idat), w, h, channels).reshape(
        h, w, channels
    )
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        pixels = pal[pixels[:, :, 0]]
    return np.ascontiguousarray(pixels)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """HxWxC uint8 -> PNG bytes with every scanline filtered by
    ``filter_type`` (0-4) — the synthesis side of the differential test;
    non-zero filters force the decoder's reconstruction recurrences to
    actually run."""
    import zlib

    h, w, c = img.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    bpp = c
    raw = img.reshape(h, w * c).astype(np.int32)
    lines = []
    for y in range(h):
        line = raw[y]
        prior = raw[y - 1] if y > 0 else np.zeros(w * c, np.int32)
        a = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
        cdiag = np.concatenate([np.zeros(bpp, np.int32), prior[:-bpp]])
        if filter_type == 0:
            filt = line
        elif filter_type == 1:
            filt = line - a
        elif filter_type == 2:
            filt = line - prior
        elif filter_type == 3:
            filt = line - (a + prior) // 2
        else:
            p = a + prior - cdiag
            pa, pb, pc = np.abs(p - a), np.abs(p - prior), np.abs(p - cdiag)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prior, cdiag)
            )
            filt = line - pred
        lines.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color, 0, 0, 0])
    )
    idat = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        import zlib as z

        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + z.crc32(ctype + body).to_bytes(4, "big")
        )

    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a binary image payload to an HxWxC uint8 numpy array.

    Pure-numpy parsers cover netpbm P5/P6, BI_RGB 8/24-bit BMP, 8-bit
    non-interlaced PNG (stdlib zlib), and baseline sequential JPEG
    (analytics/jpeg.py — Huffman + IDCT + YCbCr in numpy). Progressive
    JPEG / other formats raise NotImplementedError; the mapInPandas
    plumbing around this call is identical whichever decoder backs it."""
    payload = bytes(payload)
    if payload[:2] in (b"P5", b"P6"):
        return _parse_netpbm(payload)
    if payload[:2] == b"BM":
        return _parse_bmp(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _parse_png(payload)
    if payload[:2] == b"\xff\xd8":
        from audit_star_spark.analytics.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from audit_star_spark.analytics.gif import decode_gif

        return decode_gif(payload)
    raise NotImplementedError(
        "netpbm P5/P6, BI_RGB BMP, 8-bit PNG, baseline/progressive/12-bit "
        "JPEG, and GIF decode here; arithmetic JPEG and other formats are "
        "out of scope in this codec-library-free environment"
    )


def encode_netpbm(img: np.ndarray) -> bytes:
    """HxWx{1,3} uint8 -> binary PGM/PPM bytes (the re-encode side)."""
    h, w, c = img.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: text re-encoded as an opaque binary
    payload column + typed metadata (what an image/audio table looks like:
    (id, payload binary, meta...))."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.col("source").alias("media_source"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Decode + nearest-neighbor rescale + re-encode as netpbm. Works for
    every format ``decode_image`` handles; numpy fancy-indexing does the
    rescale, so no codec or imaging library is involved."""
    img = decode_image(payload)
    h, w, _c = img.shape
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return encode_netpbm(np.ascontiguousarray(img[rows][:, cols]))


def resize_bilinear(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Bilinear rescale with half-pixel centers (the PIL/TF
    align_corners=False convention): source coordinate of output pixel
    d is ``(d + 0.5) * src/dst - 0.5``, edge-clamped; channels resample
    independently; output rounds half-away back to the input dtype.
    Bilinear interpolation reproduces any per-axis-linear image exactly
    (the closed-form differential the tests lean on). Vectorized numpy
    gather — no per-pixel Python."""
    if width < 1 or height < 1:
        raise ValueError("target dimensions must be >= 1")
    h, w, c = img.shape
    sy = np.clip((np.arange(height) + 0.5) * h / height - 0.5, 0, h - 1)
    sx = np.clip((np.arange(width) + 0.5) * w / width - 0.5, 0, w - 1)
    y0 = np.floor(sy).astype(np.int64)
    x0 = np.floor(sx).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (sy - y0)[:, None, None]
    fx = (sx - x0)[None, :, None]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - fx) + f[y0][:, x1] * fx
    bot = f[y1][:, x0] * (1 - fx) + f[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    hi = 65535 if img.dtype == np.uint16 else 255
    return np.clip(np.floor(out + 0.5), 0, hi).astype(img.dtype)


def center_crop(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Centered crop (floor offsets); raises when the crop exceeds the
    image — silent padding would corrupt training statistics."""
    h, w, _c = img.shape
    if width > w or height > h:
        raise ValueError(f"crop {width}x{height} exceeds image {w}x{h}")
    top = (h - height) // 2
    left = (w - width) // 2
    return img[top : top + height, left : left + width]


def hflip(img: np.ndarray) -> np.ndarray:
    """Horizontal mirror (the standard training-time augmentation)."""
    return img[:, ::-1]


VISION_PREP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def vision_preprocess(
    media: DataFrame,
    width: int,
    height: int,
    crop: tuple[int, int] | None = None,
    flip: bool = False,
) -> DataFrame:
    """The vision-training preprocessing chain as one narrow pass:
    decode -> optional hflip -> bilinear resize to (width, height) ->
    optional center crop -> re-encode netpbm. Emits (doc_id, payload,
    width, height, mean_luma); poison payloads degrade to NULLs. 8-bit
    outputs only (netpbm re-encode); 12-bit JPEG inputs are rescaled to
    8-bit first (>> 4) so the chain composes over mixed corpora."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            payloads, ws, hs, lumas = [], [], [], []
            for payload in pdf["payload"]:
                try:
                    img = decode_image(bytes(payload))
                    if img.dtype == np.uint16:
                        img = (img >> 4).astype(np.uint8)
                    if flip:
                        img = hflip(img)
                    img = resize_bilinear(img, width, height)
                    if crop is not None:
                        img = center_crop(img, crop[0], crop[1])
                    img = np.ascontiguousarray(img)
                    payloads.append(encode_netpbm(img))
                    hs.append(img.shape[0])
                    ws.append(img.shape[1])
                    lumas.append(
                        float(np.round(img.astype(np.float64).mean(), 6))
                    )
                except Exception:  # noqa: BLE001 — poison-payload degrade
                    payloads.append(None)
                    ws.append(None)
                    hs.append(None)
                    lumas.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                }
            )

    return media.mapInPandas(run, schema=VISION_PREP_SCHEMA)


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def image_meta(media: DataFrame) -> DataFrame:
    """Real decode + feature extraction over binary payloads: per image,
    format / dimensions / channel count / mean luminance (ITU-R 601 for
    RGB). Undecodable payloads degrade to format='unknown' with NULL
    metrics instead of failing the task — at corpus scale a poison
    payload must not kill the stage."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            fmts, ws, hs, cs, lumas = [], [], [], [], []
            for payload in pdf["payload"]:
                try:
                    img = decode_image(bytes(payload))
                except Exception:  # noqa: BLE001 — poison-payload degrade:
                    # fuzzing corrupted JPEGs surfaced KeyError (missing
                    # Huffman table id), TypeError, and StopIteration
                    # beyond the expected ValueError/IndexError — ANY
                    # decode failure must degrade this row, never kill
                    # a corpus-scale stage
                    fmts.append("unknown")
                    ws.append(None), hs.append(None), cs.append(None)
                    lumas.append(None)
                    continue
                data = bytes(payload)
                if data[: len(_PNG_SIG)] == _PNG_SIG:
                    fmts.append("png")
                elif data[:2] == b"\xff\xd8":
                    fmts.append("jpeg")
                elif data[:6] in (b"GIF87a", b"GIF89a"):
                    fmts.append("gif")
                else:
                    fmts.append({b"P5": "pgm", b"P6": "ppm", b"BM": "bmp"}[data[:2]])
                h, w, c = img.shape
                ws.append(w), hs.append(h), cs.append(c)
                if c == 3:
                    f = img.astype(np.float64)
                    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
                else:
                    luma = img[..., 0].astype(np.float64)
                lumas.append(float(luma.mean()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "format": pd.Series(fmts, dtype="object"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "channels": pd.Series(cs, dtype="Int32"),
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                }
            )

    return media.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def _parse_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM -> (sample_rate, n_channels, samples int16).

    Walks the chunk list properly (fmt may be followed by LIST/fact/...
    before data), accepts only format 1 (integer PCM) at 16 bits — the
    uncompressed case, decodable with pure numpy exactly like the image
    side. Anything else raises for the caller's degrade path."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format == 1 and bits == 16:
        return rate, channels, np.frombuffer(data, dtype="<i2")
    if audio_format in (6, 7) and bits == 8:  # G.711 A-law / mu-law
        table = _g711_table("alaw" if audio_format == 6 else "ulaw")
        return rate, channels, table[np.frombuffer(data, dtype=np.uint8)]
    raise ValueError(
        "only 16-bit integer PCM and 8-bit G.711 decode without codecs"
    )


def encode_wav(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """int16 PCM -> RIFF/WAVE bytes (the synthesis side of the
    differential test)."""
    pcm = samples.astype("<i2").tobytes()
    block = 2 * channels
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def _parse_audio(payload: bytes) -> tuple[int, int, np.ndarray, str]:
    """Audio decode dispatch by magic: RIFF/WAVE 16-bit PCM
    (:func:`_parse_wav`) or FLAC (analytics/flac.py — constant/verbatim/
    fixed/LPC subframes, Rice residuals, stereo decorrelation). Returns
    (rate, channels, interleaved int samples, format). MP3 remains a
    documented raise — a psychoacoustic codec is out of scope here."""
    payload = bytes(payload)
    if payload[:4] == b"fLaC":
        from audit_star_spark.analytics.flac import parse_flac

        rate, channels, _bps, frames = parse_flac(payload)
        return rate, channels, frames.reshape(-1), "flac"
    rate, channels, s = _parse_wav(payload)
    return rate, channels, s, "wav"


def audio_meta(media: DataFrame) -> DataFrame:
    """Real audio decode + feature extraction: per payload, sample rate /
    channel count / duration plus RMS amplitude and zero-crossing count
    (the classic cheap speech/music discriminators). WAV and FLAC decode
    (_parse_audio); undecodable payloads degrade to format='unknown'
    with NULL metrics — same poison-payload policy as ``image_meta``."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            cols: dict[str, list] = {k: [] for k in
                                     ("format", "sample_rate", "n_channels",
                                      "n_samples", "duration_s", "rms",
                                      "zero_crossings")}
            for payload in pdf["payload"]:
                try:
                    rate, channels, s, fmt = _parse_audio(bytes(payload))
                except Exception:  # noqa: BLE001
                    # MP2 (Layer II): FULL subband decode — rms comes
                    # from the requantized subband samples (the
                    # filterbank is near-orthonormal); zcr would need
                    # PCM synthesis (the documented 512-tap raise)
                    try:
                        from audit_star_spark.analytics.mp3 import (
                            SAMPLES_PER_FRAME,
                            decode_mp3_layer2,
                        )

                        info = decode_mp3_layer2(bytes(payload))
                        cols["format"].append("mp2")
                        cols["sample_rate"].append(info["sample_rate"])
                        cols["n_channels"].append(info["channels"])
                        cols["n_samples"].append(
                            info["n_frames"] * SAMPLES_PER_FRAME
                        )
                        cols["duration_s"].append(
                            info["n_frames"]
                            * SAMPLES_PER_FRAME
                            / info["sample_rate"]
                        )
                        cols["rms"].append(info["subband_rms"])
                        cols["zero_crossings"].append(None)
                        continue
                    except Exception:  # noqa: BLE001 — fall through
                        pass
                    # MP3 (Layer III): header census without sample
                    # decode — rate, channels, duration from the frame
                    # walk; sample metrics stay NULL (analytics/mp3.py)
                    try:
                        from audit_star_spark.analytics.mp3 import (
                            SAMPLES_PER_FRAME,
                            parse_mp3,
                        )

                        info = parse_mp3(bytes(payload))
                        cols["format"].append("mp3")
                        cols["sample_rate"].append(info["sample_rate"])
                        cols["n_channels"].append(info["channels"])
                        cols["n_samples"].append(
                            info["n_frames"] * SAMPLES_PER_FRAME
                        )
                        cols["duration_s"].append(info["duration_s"])
                        cols["rms"].append(None)
                        cols["zero_crossings"].append(None)
                        continue
                    except Exception:  # noqa: BLE001 — same poison-payload
                        pass
                    # degrade rule as image_meta
                    for k in cols:
                        cols[k].append(None)
                    cols["format"][-1] = "unknown"
                    continue
                n = len(s) // channels
                f = s.astype(np.float64)
                cols["format"].append(fmt)
                cols["sample_rate"].append(rate)
                cols["n_channels"].append(channels)
                cols["n_samples"].append(n)
                cols["duration_s"].append(n / rate)
                cols["rms"].append(float(np.sqrt(np.mean(f * f))))
                cols["zero_crossings"].append(int(np.sum(f[1:] * f[:-1] < 0)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "format": pd.Series(cols["format"], dtype="object"),
                    "sample_rate": pd.Series(cols["sample_rate"], dtype="Int32"),
                    "n_channels": pd.Series(cols["n_channels"], dtype="Int32"),
                    "n_samples": pd.Series(cols["n_samples"], dtype="Int64"),
                    "duration_s": pd.Series(cols["duration_s"], dtype="float64"),
                    "rms": pd.Series(cols["rms"], dtype="float64"),
                    "zero_crossings": pd.Series(cols["zero_crossings"], dtype="Int64"),
                }
            )

    return media.mapInPandas(run, schema=AUDIO_META_SCHEMA)


# square-wave synthesis parameters for the audio differential test —
# chosen so every feature has a closed form the SQL oracle can state:
# a ±AMP square wave has rms == AMP exactly, and its zero crossings are
# the sign flips at multiples of the half-period
AUDIO_RATE = 16_000
AUDIO_AMP = 8_000


def synth_audio(docs: DataFrame) -> DataFrame:
    """Deterministic per-document WAV payloads: a ±AMP square wave with
    half-period 10 + doc_id % 7 samples and length 800 + (doc_id % 5) * 160
    samples at 16 kHz mono. Runs in the same Arrow-batched mapInPandas
    plumbing a real transcoder would."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                half = 10 + int(doc_id) % 7
                n = 800 + (int(doc_id) % 5) * 160
                i = np.arange(n)
                s = AUDIO_AMP * (1 - 2 * ((i // half) % 2))
                payloads.append(encode_wav(s.astype("<i2"), AUDIO_RATE))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    from audit_star_spark.util import spread

    # spread: a one-split scan would serialize synth+decode onto one core
    return spread(docs.select("doc_id")).mapInPandas(run, schema=schema)


def sample_frames(media: DataFrame, frame_size: int = 64, every_n: int = 4) -> DataFrame:
    """Frame sampling over binary payloads: treat each payload as a
    sequence of fixed-size frames and emit every ``every_n``-th one —
    the deterministic stand-in for video frame extraction, with the REAL
    plumbing a decoder would need: 1:N Arrow-batched ``mapInPandas``
    (one input row fans out to many frame rows), narrow execution, and
    per-frame metadata. Swap the slicing for a codec call and the Spark
    side is unchanged."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, sizes, md5s = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = (len(data) + frame_size - 1) // frame_size
                for i in range(0, n_frames, every_n):
                    frame = data[i * frame_size : (i + 1) * frame_size]
                    ids.append(int(doc_id))
                    idxs.append(i)
                    sizes.append(len(frame))
                    md5s.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas — the
    deterministic stand-in for a decode+embed stage. Computes byte length,
    md5, and the mean of the first 16 byte values."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "head_mean": payloads.map(
                        # max(..., 1): a zero-byte payload must yield 0.0,
                        # not a stage-killing ZeroDivisionError
                        lambda b: float(sum(bytes(b)[:16])) / max(min(len(b), 16), 1)
                    ),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# ------------------------------------------- perceptual hashing (r3)
AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.StringType()),
        T.StructField("ahash_bits", T.LongType()),
    ]
)


def _ahash_of(img: "np.ndarray", hash_size: int = 8) -> tuple[str, int]:
    """Average hash: gray (ITU-R 601 for RGB) -> nearest-neighbor resize
    to SxS (same index mapping as resize_image) -> strict greater-than-
    mean threshold -> row-major bits, MSB first. Returns (hex string,
    the same 64 bits as a two's-complement int64 for in-engine XOR)."""
    if img.shape[2] == 3:
        f = img.astype(np.float64)
        gray = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    else:
        gray = img[..., 0].astype(np.float64)
    h, w = gray.shape
    rows = (np.arange(hash_size) * h) // hash_size
    cols = (np.arange(hash_size) * w) // hash_size
    small = gray[rows][:, cols]
    return _pack_bits((small > small.mean()).flatten())


def _pack_bits(bits: "np.ndarray") -> tuple[str, int]:
    """Row-major bit vector -> (lowercase hex, two's-complement int64 of
    the low 64 bits for in-engine XOR). First bit = MSB."""
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    hex_str = format(val, f"0{max(1, len(bits) // 4)}x")
    signed = int(np.uint64(val & (2**64 - 1)).astype(np.int64))
    return hex_str, signed


def image_ahash(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """Per image: the perceptual average-hash — (doc_id, ahash hex,
    ahash_bits int64). Near-identical images (recompression, small edits,
    rescale) collide or land within a few bits; unrelated images differ
    in ~half the bits. Narrow mapInPandas, same poison-payload degrade
    contract as image_meta (undecodable -> NULL hash)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            hexes, vals = [], []
            for payload in pdf["payload"]:
                try:
                    hx, vl = _ahash_of(decode_image(bytes(payload)), hash_size)
                except Exception:  # noqa: BLE001 — poison-payload degrade
                    hx, vl = None, None
                hexes.append(hx)
                vals.append(vl)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "ahash": pd.Series(hexes, dtype="object"),
                    "ahash_bits": pd.Series(vals, dtype="Int64"),
                }
            )

    return media.mapInPandas(run, schema=AHASH_SCHEMA)


def ahash_near_pairs(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash: (doc_a, doc_b,
    hamming) for pairs within ``max_hamming`` bits.

    Scale shape (the simhash recipe applied to the image modality):
    EXACT-recall multi-band blocking — the 64-bit ahash splits into
    ``max_hamming + 1`` contiguous bands and candidates are
    band-equality collisions, so by pigeonhole every qualifying pair
    collides in >= 1 band (the old 16-bit prefix bucket missed pairs
    differing in a high bit). Exact Hamming verifies inside the join;
    DISTINCT folds multi-band hits. No all-pairs product. The lazy
    localCheckpoint materializes fingerprints once (on the first action,
    not at construction) for the self-join and releases the blocks when
    unreferenced (a bare persist leaked the cache into the session);
    lineage truncation is acceptable for this cheap-to-rebuild input."""
    from audit_star_spark.analytics.dedup import hamming_bands

    fp = (
        image_ahash(media)
        .filter(F.col("ahash_bits").isNotNull())
        .localCheckpoint(eager=False)
    )
    band_vals = F.array(
        *[
            F.expr(f"shiftright(ahash_bits, {s}) & {(1 << w) - 1}")
            for s, w in hamming_bands(64, max_hamming)
        ]
    )
    bk = fp.select(
        "doc_id", "ahash_bits", F.posexplode(band_vals).alias("band", "val")
    )
    a, b = bk.alias("a"), bk.alias("b")
    hamming = F.expr("bit_count(a.ahash_bits ^ b.ahash_bits)")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------- frequency-domain pHash (r14)
PHASH_SIZE = 8  # low-frequency block -> 64 hash bits
PHASH_INPUT = 32  # gray resize target before the DCT
PHASH_Q = 1024  # Q10 fixed-point DCT basis scale


def _phash_basis() -> list[list[int]]:
    import math

    return [
        [
            round(
                math.cos(math.pi * (2 * x + 1) * u / (2 * PHASH_INPUT))
                * PHASH_Q
            )
            for x in range(PHASH_INPUT)
        ]
        for u in range(PHASH_SIZE)
    ]


PHASH_BASIS = _phash_basis()

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.StringType()),
        T.StructField("phash_bits", T.LongType()),
    ]
)


def _phash_of(img: "np.ndarray") -> tuple[str, int]:
    """Perceptual DCT hash (the classic pHash; the frequency-domain
    complement of :func:`_ahash_of`, robust to brightness/contrast and
    mild blur where the average hash is not): integer gray (the ITU-R
    601 weights as (299R + 587G + 114B) // 1000) -> nearest-neighbor
    resize to 32x32 (same index mapping as resize_image) -> separable
    2-D DCT-II against the Q10 FIXED-POINT basis ``PHASH_BASIS`` (the
    JPEG integer-DCT practice: every coefficient is an exact int64 —
    |pass1| < 2^23, |coef| < 2^38 — so the hash is platform- and
    engine-exact, with no transcendental last-ulp risk) -> the 8x8
    low-frequency block, thresholded against its median (as the exact
    integer test 2*coef > c[31]+c[32]), row-major bits MSB-first."""
    if img.shape[2] == 3:
        f = img.astype(np.int64)
        gray = (299 * f[..., 0] + 587 * f[..., 1] + 114 * f[..., 2]) // 1000
    else:
        gray = img[..., 0].astype(np.int64)
    h, w = gray.shape
    rows = (np.arange(PHASH_INPUT) * h) // PHASH_INPUT
    cols = (np.arange(PHASH_INPUT) * w) // PHASH_INPUT
    g = gray[rows][:, cols]
    basis = np.array(PHASH_BASIS, dtype=np.int64)
    coef = (basis @ g @ basis.T).flatten()
    s = np.sort(coef)
    med2 = int(s[PHASH_SIZE * PHASH_SIZE // 2 - 1] + s[PHASH_SIZE * PHASH_SIZE // 2])
    return _pack_bits(2 * coef > med2)


def image_phash(media: DataFrame) -> DataFrame:
    """Per image: the DCT perceptual hash — (doc_id, phash hex,
    phash_bits int64). The LAION-style image-dedup fingerprint
    (Schuhmann et al. 2021 filter near-duplicates by perceptual hash):
    recompressed / brightness-shifted / mildly blurred copies land
    within a few bits. Narrow mapInPandas, same poison-payload degrade
    contract as image_ahash (undecodable -> NULL hash)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            hexes, vals = [], []
            for payload in pdf["payload"]:
                try:
                    hx, vl = _phash_of(decode_image(bytes(payload)))
                except Exception:  # noqa: BLE001 — poison-payload degrade
                    hx, vl = None, None
                hexes.append(hx)
                vals.append(vl)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "phash": pd.Series(hexes, dtype="object"),
                    "phash_bits": pd.Series(vals, dtype="Int64"),
                }
            )

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def phash_near_pairs(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-duplicate pairs by DCT perceptual hash: (doc_a,
    doc_b, hamming) within ``max_hamming`` bits — the same EXACT-recall
    pigeonhole banding as :func:`ahash_near_pairs` (64 bits split into
    max_hamming + 1 contiguous bands; every qualifying pair collides in
    >= 1 band; exact Hamming verifies inside the join; no all-pairs
    product), applied to the frequency-domain fingerprint."""
    from audit_star_spark.analytics.dedup import hamming_bands

    fp = (
        image_phash(media)
        .filter(F.col("phash_bits").isNotNull())
        .localCheckpoint(eager=False)
    )
    band_vals = F.array(
        *[
            F.expr(f"shiftright(phash_bits, {s}) & {(1 << w) - 1}")
            for s, w in hamming_bands(64, max_hamming)
        ]
    )
    bk = fp.select(
        "doc_id", "phash_bits", F.posexplode(band_vals).alias("band", "val")
    )
    a, b = bk.alias("a"), bk.alias("b")
    hamming = F.expr("bit_count(a.phash_bits ^ b.phash_bits)")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------- audio fingerprint (r3)
AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("afp", T.StringType()),
        T.StructField("afp_bits", T.LongType()),
    ]
)


def audio_fingerprint(media: DataFrame, n_windows: int = 64) -> DataFrame:
    """Energy-contour fingerprint over decoded WAV payloads — the audio
    analog of ``image_ahash``: split the sample stream into ``n_windows``
    equal windows (remainder dropped), per-window mean energy, strict
    greater-than-global-mean threshold, 64 bits packed MSB-first to
    (hex, int64). Channels stay interleaved (energy is channel-agnostic
    for this cheap contour). Payloads too short for one sample per
    window degrade to NULL, as do undecodable ones."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            hexes, vals = [], []
            for payload in pdf["payload"]:
                try:
                    _rate, _ch, s = _parse_wav(bytes(payload))
                    L = len(s) // n_windows
                    if L == 0:
                        raise ValueError("payload shorter than one window")
                    f = s[: L * n_windows].astype(np.float64)
                    en = (f * f).reshape(n_windows, L).mean(axis=1)
                    hx, vl = _pack_bits(en > en.mean())
                except Exception:  # noqa: BLE001 — poison-payload degrade
                    hx, vl = None, None
                hexes.append(hx)
                vals.append(vl)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "afp": pd.Series(hexes, dtype="object"),
                    "afp_bits": pd.Series(vals, dtype="Int64"),
                }
            )

    return media.mapInPandas(run, schema=AUDIO_FP_SCHEMA)


# windowed-synthesis parameters for the fingerprint differential gate:
# 64 windows x 25 samples; window w is a ±A_w square wave (half-period 5)
# with A_w = 100 * (1 + (doc_id + 3w) % 5), so each window's mean energy
# is EXACTLY A_w² and the oracle states the whole fingerprint in SQL
FP_WINDOWS = 64
FP_WINDOW_LEN = 25


def synth_windowed_audio(docs: DataFrame) -> DataFrame:
    """Per-document WAV whose 64-window energy contour follows a closed
    form (same differential-synthesis pattern as synth_audio)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                amps = np.array(
                    [100 * (1 + (d + 3 * w) % 5) for w in range(FP_WINDOWS)]
                )
                i = np.arange(FP_WINDOW_LEN)
                sign = 1 - 2 * ((i // 5) % 2)
                s = (amps[:, None] * sign[None, :]).reshape(-1)
                payloads.append(encode_wav(s.astype("<i2"), AUDIO_RATE))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    from audit_star_spark.util import spread

    return spread(docs.select("doc_id")).mapInPandas(run, schema=schema)


# --------------------------------------------------- video: MJPEG/AVI (r4)
# A real container + real frame decode: RIFF/AVI parsed from the public
# byte layout (RIFF chunks, 'avih' main header, 'movi' data chunks), with
# MJPEG frame payloads decoded by the in-repo baseline JPEG codec — the
# video pipeline stops being a byte-slicing stand-in.


def encode_avi_mjpeg(frames: list, fps: int = 10) -> bytes:
    """Minimal spec-shaped MJPEG AVI: RIFF('AVI ') with an hdrl LIST
    (avih + one video strl) and a movi LIST of '00dc' JPEG chunks —
    enough structure for any AVI-aware reader, and the synthesis side of
    the decode differential. ``frames`` are HxWx{1,3} uint8 arrays,
    JPEG-encoded at quality=100 (tile-constant frames decode
    bit-exactly)."""
    from audit_star_spark.analytics.jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quality=100) for f in frames]

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + len(data).to_bytes(4, "little") + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    us_per_frame = 1_000_000 // fps
    avih = chunk(
        b"avih",
        us_per_frame.to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 3
        + len(frames).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (1).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4,
    )
    strh = chunk(
        b"strh",
        b"vids" + b"MJPG"
        + (0).to_bytes(4, "little") * 3  # flags, prio/lang, initialframes
        + (1).to_bytes(4, "little")  # scale
        + fps.to_bytes(4, "little")  # rate
        + (0).to_bytes(4, "little")  # start
        + len(frames).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 3  # bufsize, quality, samplesize
        + (0).to_bytes(8, "little"),  # rcFrame
    )
    strf = chunk(
        b"strf",
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"MJPG"
        + (0).to_bytes(4, "little") * 5,
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def video_scene_cuts(media: DataFrame, threshold: float = 20.0) -> DataFrame:
    """Shot-boundary (scene-cut) census over decoded video — the
    keyframe-segmentation step a vision-language curation pipeline runs
    before frame sampling: a CUT at frame i (i >= 1) when the
    luma-mean difference |mean_i - mean_{i-1}| exceeds ``threshold``
    (frame-difference energy, the classic hard-cut detector).

    Per doc: n_frames (decoded), n_cuts, first_cut_idx (NULL when the
    video is one shot), max_jump6 (largest inter-frame jump, 6 dp; NULL
    for single-frame videos).

    Scale shape: the per-frame decode is the same 1:N narrow
    mapInPandas as video_frame_means (every frame, stride 1); the lag
    runs under a window PARTITIONED BY doc_id (bounded by frames per
    video, never corpus-wide); the census is one map-side-combined
    groupBy. MAX/MIN/COUNT are order-free, so no float fold is needed.
    Undecodable payloads or frames contribute no rows (the video_meta
    degrade contract)."""
    from pyspark.sql import Window

    frames = video_frame_means(media, every_n=1)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    jumps = frames.withColumn(
        "jump", F.abs(F.col("mean_luma") - F.lag("mean_luma").over(w))
    )
    return jumps.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum(F.when(F.col("jump") > threshold, 1).otherwise(0))
        .cast("long")
        .alias("n_cuts"),
        F.min(F.when(F.col("jump") > threshold, F.col("frame_idx"))).alias(
            "first_cut_idx"
        ),
        F.round(F.max("jump"), 6).alias("max_jump6"),
    )


def parse_avi(payload: bytes) -> dict:
    """RIFF/AVI -> {width, height, us_per_frame, n_frames, frames:[bytes]}.
    Walks the chunk tree; frame data is every 00dc/00db chunk inside the
    movi LIST. Raises ValueError on anything that is not an AVI."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    meta: dict = {"frames": []}

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            data_start = pos + 8
            data_end = min(data_start + size, end)
            if fourcc == b"LIST":
                walk(buf, data_start + 4, data_end)
            elif fourcc == b"avih":
                body = buf[data_start:data_end]
                if len(body) < 40:
                    raise ValueError("truncated avih header")
                meta["us_per_frame"] = int.from_bytes(body[0:4], "little")
                meta["n_frames"] = int.from_bytes(body[16:20], "little")
                meta["width"] = int.from_bytes(body[32:36], "little")
                meta["height"] = int.from_bytes(body[36:40], "little")
            elif fourcc in (b"00dc", b"00db"):
                meta["frames"].append(buf[data_start:data_end])
            pos = data_start + size + (size % 2)

    walk(payload, 12, len(payload))
    if "width" not in meta:
        raise ValueError("missing avih header")
    return meta


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_data_chunks", T.LongType()),
    ]
)


def video_meta(media: DataFrame) -> DataFrame:
    """Per-video container metadata from a real AVI parse; undecodable
    payloads degrade to container='unknown' (the poison-payload
    contract every decoder here follows)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "container", "width", "height", "fps",
                    "n_frames", "n_data_chunks")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    m = parse_avi(bytes(payload))
                    row = ("avi", m["width"], m["height"],
                           round(1_000_000.0 / m["us_per_frame"], 6)
                           if m.get("us_per_frame") else None,
                           m.get("n_frames"), len(m["frames"]))
                except Exception:  # noqa: BLE001 — poison-payload degrade
                    row = ("unknown", None, None, None, None, None)
                out["doc_id"].append(doc_id)
                for k, v in zip(
                    ("container", "width", "height", "fps", "n_frames",
                     "n_data_chunks"), row,
                ):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "container": pd.Series(out["container"], dtype="object"),
                    "width": pd.Series(out["width"], dtype="Int32"),
                    "height": pd.Series(out["height"], dtype="Int32"),
                    "fps": pd.Series(out["fps"], dtype="Float64"),
                    "n_frames": pd.Series(out["n_frames"], dtype="Int64"),
                    "n_data_chunks": pd.Series(out["n_data_chunks"], dtype="Int64"),
                }
            )

    return media.mapInPandas(run, schema=VIDEO_META_SCHEMA)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def video_frame_means(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: parse the AVI, decode every ``every_n``-th
    MJPEG frame with the in-repo JPEG decoder, and emit per-frame
    dimensions + mean luma (mean over channels for color frames). 1:N
    in-row fan-out, narrow execution; undecodable payloads or frames
    contribute no rows."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        from audit_star_spark.analytics.jpeg import decode_jpeg

        for pdf in batches:
            ids, idxs, ws, hs, lumas = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    frames = parse_avi(bytes(payload))["frames"]
                except Exception:  # noqa: BLE001
                    continue
                for i in range(0, len(frames), every_n):
                    try:
                        img = decode_jpeg(frames[i])
                    except Exception:  # noqa: BLE001
                        continue
                    ids.append(doc_id)
                    idxs.append(i)
                    hs.append(img.shape[0])
                    ws.append(img.shape[1])
                    lumas.append(float(np.round(img.astype(np.float64).mean(), 6)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                }
            )

    return media.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


GIF_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("disposal", T.IntegerType()),
        T.StructField("transparent", T.BooleanType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def gif_frame_means(media: DataFrame) -> DataFrame:
    """REAL animated-GIF compositing through the Spark surface: every
    frame's TRUE canvas (gif.parse_gif_frames — disposal methods, frame
    offsets, transparency all honored) reduced to per-channel means —
    the GIF analog of ``video_frame_means``. 1:N in-row fan-out, narrow
    execution; undecodable payloads contribute no rows."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        from audit_star_spark.analytics.gif import parse_gif_frames

        for pdf in batches:
            ids, idxs, disp, trans, mr, mg, mb = [], [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    frames = parse_gif_frames(bytes(payload))
                except Exception:  # noqa: BLE001
                    continue
                for i, fr in enumerate(frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    disp.append(fr["disposal"])
                    trans.append(fr["transparent"])
                    px = fr["frame"].astype(np.float64)
                    mr.append(float(np.round(px[:, :, 0].mean(), 6)))
                    mg.append(float(np.round(px[:, :, 1].mean(), 6)))
                    mb.append(float(np.round(px[:, :, 2].mean(), 6)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "disposal": pd.Series(disp, dtype="int32"),
                    "transparent": pd.Series(trans, dtype="bool"),
                    "mean_r": pd.Series(mr, dtype="float64"),
                    "mean_g": pd.Series(mg, dtype="float64"),
                    "mean_b": pd.Series(mb, dtype="float64"),
                }
            )

    return media.mapInPandas(run, schema=GIF_FRAME_SCHEMA)


AUDIO_RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_resample(media: DataFrame, factor: int) -> DataFrame:
    """Integer-factor downsampling of 16-bit PCM audio — the 44.1k/48k ->
    16k mono prep step every speech-model pipeline runs. Each output
    sample is the MEAN of ``factor`` consecutive input samples (a boxcar
    anti-alias filter — exact, deterministic, and oracle-stateable,
    unlike a windowed-sinc kernel), trailing remainder samples dropped,
    rounded half-away-from-zero back to int16. Multi-channel inputs are
    downmixed to mono (channel mean) first.

    Returns (doc_id, payload re-encoded WAV at rate/factor, sample_rate,
    n_samples, rms) — payload carried so downstream feature extractors
    (fingerprint, meta) run on the resampled audio unchanged. Narrow
    mapInPandas, no shuffle; poison payloads degrade to NULL payload
    with NULL metrics (the repo-wide decoder contract)."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            payloads, rates, counts, rmss = [], [], [], []
            for payload in pdf["payload"]:
                try:
                    rate, channels, s = _parse_wav(bytes(payload))
                    if rate % factor != 0:
                        raise ValueError("rate not divisible by factor")
                    f = s.astype(np.float64)
                    if channels > 1:
                        f = f[: len(f) - len(f) % channels]
                        f = f.reshape(-1, channels).mean(axis=1)
                    n_blocks = len(f) // factor
                    blocks = f[: n_blocks * factor].reshape(n_blocks, factor)
                    means = blocks.mean(axis=1)
                    out = np.sign(means) * np.floor(np.abs(means) + 0.5)
                    out = np.clip(out, -32768, 32767).astype("<i2")
                    payloads.append(encode_wav(out, rate // factor))
                    rates.append(rate // factor)
                    counts.append(n_blocks)
                    fo = out.astype(np.float64)
                    rmss.append(
                        float(np.sqrt(np.mean(fo * fo))) if n_blocks else None
                    )
                except Exception:  # noqa: BLE001 — poison-payload degrade
                    payloads.append(None)
                    rates.append(None)
                    counts.append(None)
                    rmss.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "sample_rate": pd.Series(rates, dtype="Int32"),
                    "n_samples": pd.Series(counts, dtype="Int64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                }
            )

    return media.mapInPandas(run, schema=AUDIO_RESAMPLE_SCHEMA)


def audio_resample_rational(media: DataFrame, up: int, down: int) -> DataFrame:
    """Rational-factor resampling of 16-bit PCM audio — the 44.1 kHz ->
    16 kHz (up=160, down=441) conversion the integer-factor
    :func:`audio_resample` cannot express. The kernel is DOCUMENTED
    closed-form arithmetic (deterministic and differentially testable,
    unlike a windowed-sinc design):

    1. downmix to mono (channel mean), float64;
    2. anti-alias prefilter for net downsampling: trailing moving
       average of width ``w = down // up`` when ``w >= 2``
       (``f[i] = mean(s[i : i + w])``, ``len(f) = len(s) - w + 1``) —
       the same exact boxcar the integer path uses; identity otherwise;
    3. linear interpolation at exact rational positions: output sample
       ``n`` sits at input position ``pos = n * down / up`` (integer
       arithmetic: ``i = n * down // up``, ``frac = (n * down % up) /
       up``), ``out[n] = f[i] * (1 - frac) + f[i + 1] * frac``;
       ``n_out = (len(f) - 1) * up // down + 1``;
    4. round half away from zero back to int16.

    With ``up = 1`` the positions land exactly on the prefiltered
    samples and the result is bit-identical to ``audio_resample(down)``
    (test-locked). The output rate ``rate * up / down`` must be an
    integer or the row degrades (poison contract) — a fractional
    sample rate is not encodable in a WAV header.

    Returns the same schema as :func:`audio_resample`."""
    import math

    if up < 1 or down < 1:
        raise ValueError(f"up and down must be >= 1, got {up}/{down}")
    g = math.gcd(up, down)
    up, down = up // g, down // g

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            payloads, rates, counts, rmss = [], [], [], []
            for payload in pdf["payload"]:
                try:
                    rate, channels, s = _parse_wav(bytes(payload))
                    if (rate * up) % down != 0:
                        raise ValueError("non-integral output rate")
                    out_rate = rate * up // down
                    f = s.astype(np.float64)
                    if channels > 1:
                        f = f[: len(f) - len(f) % channels]
                        f = f.reshape(-1, channels).mean(axis=1)
                    w = down // up
                    if w >= 2:
                        if len(f) < w:
                            raise ValueError("audio shorter than filter")
                        c = np.concatenate(([0.0], np.cumsum(f)))
                        f = (c[w:] - c[:-w]) / w
                    if len(f) < 2:
                        raise ValueError("audio too short to resample")
                    n_out = (len(f) - 1) * up // down + 1
                    n = np.arange(n_out, dtype=np.int64)
                    i = n * down // up
                    frac = (n * down % up).astype(np.float64) / up
                    hi = np.minimum(i + 1, len(f) - 1)
                    vals = f[i] * (1.0 - frac) + f[hi] * frac
                    out = np.sign(vals) * np.floor(np.abs(vals) + 0.5)
                    out = np.clip(out, -32768, 32767).astype("<i2")
                    payloads.append(encode_wav(out, out_rate))
                    rates.append(out_rate)
                    counts.append(n_out)
                    fo = out.astype(np.float64)
                    rmss.append(
                        float(np.sqrt(np.mean(fo * fo))) if n_out else None
                    )
                except Exception:  # noqa: BLE001 — poison-payload degrade
                    payloads.append(None)
                    rates.append(None)
                    counts.append(None)
                    rmss.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "sample_rate": pd.Series(rates, dtype="Int32"),
                    "n_samples": pd.Series(counts, dtype="Int64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                }
            )

    return media.mapInPandas(run, schema=AUDIO_RESAMPLE_SCHEMA)


IMAGE_PATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("patch_row", T.IntegerType()),
        T.StructField("patch_col", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("std_luma", T.DoubleType()),
    ]
)


def image_patches(media: DataFrame, patch: int = 8) -> DataFrame:
    """ViT-style patch grid: decode each image, tile it into
    ``patch``x``patch`` cells (edge remainders dropped, the standard
    crop-to-multiple), and emit one row per patch with mean/std luminance
    (ITU-R 601 for RGB) — the per-patch statistics a vision-training
    curation pass filters on (blank-patch fraction, contrast). In-row
    1:N explode inside the same narrow mapInPandas the other decoders
    use; a WxH image yields (W//patch)*(H//patch) rows. Undecodable
    payloads contribute zero rows."""
    if patch < 1:
        raise ValueError(f"patch must be >= 1, got {patch}")

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload)).astype(np.float64)
                except Exception:  # noqa: BLE001 — poison degrades
                    continue
                if img.shape[2] == 3:
                    luma = (
                        0.299 * img[:, :, 0]
                        + 0.587 * img[:, :, 1]
                        + 0.114 * img[:, :, 2]
                    )
                else:
                    luma = img[:, :, 0]
                gh, gw = luma.shape[0] // patch, luma.shape[1] // patch
                if gh == 0 or gw == 0:
                    continue
                tiles = (
                    luma[: gh * patch, : gw * patch]
                    .reshape(gh, patch, gw, patch)
                    .transpose(0, 2, 1, 3)
                    .reshape(gh, gw, patch * patch)
                )
                means = tiles.mean(axis=2)
                stds = tiles.std(axis=2)
                for r in range(gh):
                    for c in range(gw):
                        rows.append(
                            {
                                "doc_id": int(doc_id),
                                "patch_row": r,
                                "patch_col": c,
                                "mean_luma": float(means[r, c]),
                                "std_luma": float(stds[r, c]),
                            }
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_PATCH_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=IMAGE_PATCH_SCHEMA)


# ------------------------------------------- video: YUV4MPEG2 (Y4M)
# The mplayer/mjpegtools interchange format: a one-line ASCII stream
# header, then per frame an ASCII "FRAME" marker followed by raw planar
# YCbCr — the simplest real video container there is, and the lingua
# franca of codec toolchains (ffmpeg -f yuv4mpegpipe). Spec: the
# yuv4mpeg(5) man page (mjpegtools).

_Y4M_PLANE_FACTORS = {
    # colorspace tag -> (cb/cr width divisor, cb/cr height divisor);
    # mono has no chroma planes at all
    "C420": (2, 2), "C420jpeg": (2, 2), "C420mpeg2": (2, 2),
    "C420paldv": (2, 2), "C422": (2, 1), "C444": (1, 1),
}


def encode_y4m(
    frames: list,
    fps: tuple = (25, 1),
    colorspace: str = "Cmono",
) -> bytes:
    """Synthesize a spec-shaped Y4M stream. ``frames`` are uint8
    arrays: (h, w) luma for Cmono, or (3, h, w) planar YCbCr for C444.
    (The synthesis side of the parse_y4m differential tests.)"""
    import numpy as np

    if colorspace not in ("Cmono", "C444"):
        raise ValueError(f"encode side supports Cmono/C444, not {colorspace}")
    first = np.asarray(frames[0])
    h, w = (first.shape if colorspace == "Cmono" else first.shape[1:])
    head = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    ).encode("ascii")
    out = [head]
    for fr in frames:
        a = np.asarray(fr, dtype=np.uint8)
        if (a.shape if colorspace == "Cmono" else a.shape[1:]) != (h, w):
            raise ValueError("all frames must share dimensions")
        out.append(b"FRAME\n")
        out.append(a.tobytes())
    return b"".join(out)


def parse_y4m(payload: bytes) -> dict:
    """Y4M -> {width, height, fps_num, fps_den, interlace, colorspace,
    n_frames, y_planes: [np.ndarray (h, w)]}. Parses the real header
    grammar (space-separated tagged params, C defaults to 420jpeg per
    the man page) and walks FRAME-by-FRAME with exact plane sizes;
    chroma planes are skipped, the luma plane is returned for every
    frame. Raises ValueError on anything that is not Y4M."""
    import numpy as np

    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = None
    fps_num, fps_den = 25, 1
    interlace, colorspace = "Ip", "C420jpeg"
    for tok in payload[:nl].decode("ascii", "replace").split(" ")[1:]:
        if not tok:
            continue
        tag, val = tok[0], tok[1:]
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif tag == "I":
            interlace = tok
        elif tag == "C":
            colorspace = tok
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    if colorspace == "Cmono":
        chroma = 0
    else:
        if colorspace not in _Y4M_PLANE_FACTORS:
            raise ValueError(f"unsupported Y4M colorspace {colorspace}")
        wd, hd = _Y4M_PLANE_FACTORS[colorspace]
        chroma = 2 * ((width // wd) * (height // hd))
    luma = width * height
    pos = nl + 1
    y_planes = []
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed FRAME marker")
        pos = fnl + 1
        if pos + luma + chroma > len(payload):
            raise ValueError("truncated Y4M frame")
        y_planes.append(
            np.frombuffer(payload[pos : pos + luma], dtype=np.uint8).reshape(
                height, width
            )
        )
        pos += luma + chroma
    return {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "interlace": interlace,
        "colorspace": colorspace,
        "n_frames": len(y_planes),
        "y_planes": y_planes,
    }


Y4M_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("colorspace", T.StringType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("mean_y", T.DoubleType()),
    ]
)


def y4m_frame_means(media: DataFrame) -> DataFrame:
    """REAL Y4M walk + per-frame luma means: one output row per frame
    with stream metadata and the exact mean of the Y plane. 1:N in-row
    fan-out, narrow execution; non-Y4M payloads contribute no rows
    (the poison-payload contract)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    m = parse_y4m(bytes(payload))
                except Exception:  # noqa: BLE001 — poison-payload degrade
                    continue
                fps = round(m["fps_num"] / m["fps_den"], 6)
                for idx, y in enumerate(m["y_planes"]):
                    rows.append(
                        (
                            int(doc_id), idx, m["width"], m["height"],
                            m["colorspace"], fps,
                            float(y.sum()) / y.size,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "colorspace", "fps", "mean_y",
                ],
            ).astype(
                {
                    "doc_id": "int64", "frame_idx": "int64",
                    "width": "int32", "height": "int32",
                    "fps": "float64", "mean_y": "float64",
                }
            )

    return media.mapInPandas(run, schema=Y4M_FRAME_SCHEMA)


# ----------------------------------------- audio: G.711 mu-law / A-law
# ITU-T G.711 — the telephony companding codec (WAV format codes 7 and
# 6). The segment decode is pure integer arithmetic, so the gate oracle
# replays it in SQL; tables are built from the spec formulas, not
# copied code.


def _g711_table(law: str) -> "np.ndarray":
    """256-entry decode table (companded byte -> linear int16)."""
    out = np.empty(256, dtype=np.int16)
    if law == "ulaw":
        for b in range(256):
            u = ~b & 0xFF
            t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
            out[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    elif law == "alaw":
        for b in range(256):
            a = b ^ 0x55
            seg = (a & 0x70) >> 4
            mant = a & 0x0F
            if seg == 0:
                t = (mant << 4) + 8
            else:
                t = ((mant << 4) + 0x108) << (seg - 1)
            out[b] = t if (a & 0x80) else -t
    else:
        raise ValueError(f"unknown companding law {law!r}")
    return out


def encode_wav_g711(payload_bytes: bytes, rate: int, law: str,
                    channels: int = 1) -> bytes:
    """Companded G.711 bytes -> RIFF/WAVE with format code 7 (mu) or
    6 (A), 8 bits/sample (the synthesis side of the decode
    differential — bytes pass through verbatim)."""
    code = {"ulaw": 7, "alaw": 6}[law]
    block = 1 * channels
    fmt = (
        code.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (8).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(payload_bytes).to_bytes(4, "little") + payload_bytes
    if len(payload_bytes) & 1:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


G711_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("law", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_linear", T.LongType()),
        T.StructField("min_linear", T.IntegerType()),
        T.StructField("max_linear", T.IntegerType()),
    ]
)


def g711_sample_stats(media: DataFrame) -> DataFrame:
    """REAL G.711 decode through the WAV chunk walk: per payload, the
    companding law and exact INTEGER stats of the linearized samples
    (sum/min/max — no float folds, hash-exact by construction).
    Non-G.711 or undecodable payloads contribute no rows."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    data = bytes(payload)
                    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
                        continue
                    # peek the format code off the fmt chunk for the label
                    pos, code = 12, None
                    while pos + 8 <= len(data):
                        cid = data[pos : pos + 4]
                        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
                        if cid == b"fmt ":
                            code = int.from_bytes(
                                data[pos + 8 : pos + 10], "little"
                            )
                        pos += 8 + size + (size & 1)
                    if code not in (6, 7):
                        continue
                    rate, _ch, samples = _parse_wav(data)
                except Exception:  # noqa: BLE001 — poison-payload degrade
                    continue
                rows.append(
                    (
                        int(doc_id),
                        "alaw" if code == 6 else "ulaw",
                        rate,
                        len(samples),
                        int(samples.astype(np.int64).sum()),
                        int(samples.min()),
                        int(samples.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "law", "sample_rate", "n_samples",
                    "sum_linear", "min_linear", "max_linear",
                ],
            ).astype(
                {
                    "doc_id": "int64", "sample_rate": "int32",
                    "n_samples": "int64", "sum_linear": "int64",
                    "min_linear": "int32", "max_linear": "int32",
                }
            )

    return media.mapInPandas(run, schema=G711_STATS_SCHEMA)


MP3_L2_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_active_subbands", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("subband_rms", T.DoubleType()),
    ]
)


def mp3_layer2_census(media: DataFrame) -> DataFrame:
    """MPEG-1 Layer II subband-domain decode census (analytics/mp3.py
    decode_mp3_layer2 — bit-exact requantization; PCM synthesis is the
    documented honest raise). Narrow Arrow-batched mapInPandas over
    (doc_id, payload); poison payloads degrade to NULL metrics, the
    repo-wide decoder contract."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        from audit_star_spark.analytics.mp3 import decode_mp3_layer2

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    info = decode_mp3_layer2(bytes(payload))
                    rows.append(
                        (
                            int(doc_id),
                            info["n_frames"],
                            info["sample_rate"],
                            info["n_active_subbands"],
                            info["n_samples"],
                            info["subband_rms"],
                        )
                    )
                except Exception:  # noqa: BLE001 — poison degrade
                    rows.append((int(doc_id), None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "sample_rate",
                    "n_active_subbands", "n_samples", "subband_rms",
                ],
            ).astype(
                {
                    "doc_id": "int64", "n_frames": "Int32",
                    "sample_rate": "Int32", "n_active_subbands": "Int64",
                    "n_samples": "Int64", "subband_rms": "float64",
                }
            )

    return media.mapInPandas(run, schema=MP3_L2_SCHEMA)


MP3_L3_SIDEINFO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_granules", T.LongType()),
        T.StructField("sum_part2_3", T.LongType()),
        T.StructField("sum_big_values", T.LongType()),
        T.StructField("sum_global_gain", T.LongType()),
        T.StructField("n_short_granules", T.LongType()),
        T.StructField("max_main_data_begin", T.IntegerType()),
        T.StructField("n_reservoir_frames", T.IntegerType()),
        T.StructField("sum_scf_bits", T.LongType()),
    ]
)


def mp3_layer3_sideinfo_census(media: DataFrame) -> DataFrame:
    """MPEG-1 Layer III SIDE-INFORMATION census (analytics/mp3.py
    decode_mp3_layer3_sideinfo — the closed-form layer of L3: frame
    walk, §2.4.1.7 side-info grammar, bit-reservoir pointer, §2.4.2.7
    scalefactor bit budgets; spectral samples are the documented
    Table-B.7/B.8 raise). Narrow Arrow-batched mapInPandas over
    (doc_id, payload); poison payloads degrade to NULL metrics."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        from audit_star_spark.analytics.mp3 import decode_mp3_layer3_sideinfo

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    i = decode_mp3_layer3_sideinfo(bytes(payload))
                    rows.append(
                        (
                            int(doc_id), i["n_frames"], i["sample_rate"],
                            i["n_granules"], i["sum_part2_3"],
                            i["sum_big_values"], i["sum_global_gain"],
                            i["n_short_granules"], i["max_main_data_begin"],
                            i["n_reservoir_frames"], i["sum_scf_bits"],
                        )
                    )
                except Exception:  # noqa: BLE001 — poison degrade
                    rows.append((int(doc_id),) + (None,) * 10)
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "sample_rate", "n_granules",
                    "sum_part2_3", "sum_big_values", "sum_global_gain",
                    "n_short_granules", "max_main_data_begin",
                    "n_reservoir_frames", "sum_scf_bits",
                ],
            ).astype(
                {
                    "doc_id": "int64", "n_frames": "Int32",
                    "sample_rate": "Int32", "n_granules": "Int64",
                    "sum_part2_3": "Int64", "sum_big_values": "Int64",
                    "sum_global_gain": "Int64", "n_short_granules": "Int64",
                    "max_main_data_begin": "Int32",
                    "n_reservoir_frames": "Int32", "sum_scf_bits": "Int64",
                }
            )

    return media.mapInPandas(run, schema=MP3_L3_SIDEINFO_SCHEMA)


MP3_L3_SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_granules", T.LongType()),
        T.StructField("sum_samples", T.LongType()),
        T.StructField("sum_abs_samples", T.LongType()),
        T.StructField("n_nonzero", T.LongType()),
        T.StructField("sum_scalefacs", T.LongType()),
        T.StructField("sum_stuffing_bits", T.LongType()),
    ]
)


def mp3_layer3_samples_census(media: DataFrame, tables: dict) -> DataFrame:
    """MPEG-1 Layer III SPECTRAL-SAMPLE census through the
    user-supplied-table escape hatch (analytics/mp3.py
    decode_mp3_layer3_samples: bit-reservoir assembly, scalefactors
    with scfsi reuse, three-region big_values Huffman + linbits +
    signs, count1 tail, rzero). ``tables`` is the caller's B.7/B.8
    dict — the ISO constants themselves are never shipped here; the
    gate runs clearly-synthetic tables (synthetic_l3_tables) against
    payloads built by the matching encoder. Narrow Arrow-batched
    mapInPandas; poison payloads degrade to NULL metrics."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        from audit_star_spark.analytics.mp3 import decode_mp3_layer3_samples

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    r = decode_mp3_layer3_samples(bytes(payload), tables)
                    ss = sa = nz = sf = st = 0
                    for g in r["granules"]:
                        for v in g["samples"]:
                            ss += v
                            sa += abs(v)
                            nz += 1 if v else 0
                        sf += sum(g["scalefacs"])
                        st += g["stuffing_bits"]
                    rows.append(
                        (
                            int(doc_id), r["n_frames"], len(r["granules"]),
                            ss, sa, nz, sf, st,
                        )
                    )
                except Exception:  # noqa: BLE001 — poison degrade
                    rows.append((int(doc_id),) + (None,) * 7)
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_granules", "sum_samples",
                    "sum_abs_samples", "n_nonzero", "sum_scalefacs",
                    "sum_stuffing_bits",
                ],
            ).astype(
                {
                    "doc_id": "int64", "n_frames": "Int32",
                    "n_granules": "Int64", "sum_samples": "Int64",
                    "sum_abs_samples": "Int64", "n_nonzero": "Int64",
                    "sum_scalefacs": "Int64", "sum_stuffing_bits": "Int64",
                }
            )

    return media.mapInPandas(run, schema=MP3_L3_SAMPLES_SCHEMA)


AUDIO_SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("e_low", T.DoubleType()),
        T.StructField("e_mid", T.DoubleType()),
        T.StructField("e_high", T.DoubleType()),
        T.StructField("centroid", T.DoubleType()),
    ]
)


def audio_spectral_stats(media: DataFrame, frame: int = 64) -> DataFrame:
    """Frequency-domain audio features — the spectral census an audio
    corpus sweep runs after the time-domain one (band energy balance
    for speech/music/noise triage, spectral centroid as the brightness
    signal). Pure closed-form math, no tabulated constants:

    - decode 16-bit PCM WAV, downmix to mono, scale to [-1, 1);
    - cut into non-overlapping ``frame``-sample frames (tail dropped);
    - periodic Hann window w[t] = 0.5 - 0.5 cos(2 pi t / frame);
    - DFT per frame (numpy rfft — the textbook
      X[k] = sum_t w[t] x[t] exp(-2 pi i k t / n)), power |X[k]|^2;
    - bands over bins 1..frame/2 (DC excluded) split in thirds:
      e_low / e_mid / e_high = summed power per band across frames;
      centroid = sum(k * P[k]) / sum(P[k]).

    Scale shape: narrow Arrow-batched mapInPandas over (doc_id,
    payload) — embarrassingly parallel codec+FFT CPU, like every other
    decoder here. Poison payloads degrade to NULL metrics."""
    if frame < 8 or frame & (frame - 1):
        raise ValueError(f"frame must be a power of two >= 8, got {frame}")

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        half = frame // 2
        third = half // 3
        t = np.arange(frame)
        win = 0.5 - 0.5 * np.cos(2.0 * np.pi * t / frame)

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rate, channels, s = _parse_wav(bytes(payload))
                    x = s.astype(np.float64)
                    if channels > 1:
                        x = x.reshape(-1, channels).mean(axis=1)
                    x = x / 32768.0
                    n_frames = len(x) // frame
                    if n_frames == 0:
                        raise ValueError("shorter than one frame")
                    p_low = p_mid = p_high = 0.0
                    num = den = 0.0
                    for fr in range(n_frames):
                        seg = x[fr * frame : (fr + 1) * frame] * win
                        spec = np.fft.rfft(seg)
                        p = (spec.real**2 + spec.imag**2)[1 : half + 1]
                        p_low += float(p[:third].sum())
                        p_mid += float(p[third : 2 * third].sum())
                        p_high += float(p[2 * third :].sum())
                        ks = np.arange(1, half + 1, dtype=np.float64)
                        num += float((ks * p).sum())
                        den += float(p.sum())
                    rows.append(
                        (
                            int(doc_id), int(rate), int(n_frames),
                            p_low, p_mid, p_high,
                            (num / den) if den > 0 else None,
                        )
                    )
                except Exception:  # noqa: BLE001 — poison degrade
                    rows.append((int(doc_id),) + (None,) * 6)
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_frames",
                    "e_low", "e_mid", "e_high", "centroid",
                ],
            ).astype(
                {
                    "doc_id": "int64", "sample_rate": "Int32",
                    "n_frames": "Int32", "e_low": "float64",
                    "e_mid": "float64", "e_high": "float64",
                    "centroid": "float64",
                }
            )

    return media.mapInPandas(run, schema=AUDIO_SPECTRAL_SCHEMA)
