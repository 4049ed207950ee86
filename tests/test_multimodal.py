"""Multimodal decode layer: pure-numpy netpbm/BMP decoders, resize, and
the image_meta mapInPandas operator (real decode through Spark). The
stub-only surface from round 1 is now real for uncompressed formats;
JPEG/PNG stay NotImplementedError (no codec libs in the container)."""

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from audit_star_spark.analytics.multimodal import (
    decode_image,
    encode_netpbm,
    image_meta,
    resize_image,
)


def _img(h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


def _bmp24(img: np.ndarray, top_down: bool = False) -> bytes:
    """Hand-packed uncompressed 24-bit BMP (BITMAPINFOHEADER)."""
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    raster = b"".join(
        bytes(img[r, :, ::-1].tobytes()) + b"\0" * pad
        for r in (range(h) if top_down else range(h - 1, -1, -1))
    )
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(raster), 0, 0, 0, 0
    )
    return header + dib + raster


def _bmp8(img_idx: np.ndarray, palette: np.ndarray) -> bytes:
    """8-bit paletted BMP: img_idx HxW uint8 indices, palette Nx3 RGB."""
    h, w = img_idx.shape
    pad = (-w) % 4
    raster = b"".join(img_idx[r].tobytes() + b"\0" * pad for r in range(h - 1, -1, -1))
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    off = 14 + 40 + len(pal)
    header = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(raster), 0, 0, len(palette), 0
    )
    return header + dib + pal + raster


def test_netpbm_roundtrip_rgb_and_gray():
    for c in (1, 3):
        img = _img(5, 7, c, seed=c)
        assert np.array_equal(decode_image(encode_netpbm(img)), img)


def test_netpbm_comments_in_header():
    img = _img(2, 3, 1)
    payload = b"P5\n# a comment\n3 2\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_image(payload), img)


def test_bmp24_bottom_up_and_top_down_with_padding():
    img = _img(4, 3, 3, seed=2)  # width 3 -> 9-byte rows pad to 12
    assert np.array_equal(decode_image(_bmp24(img)), img)
    assert np.array_equal(decode_image(_bmp24(img, top_down=True)), img)


def test_bmp8_palette():
    palette = _img(1, 16, 3, seed=3)[0]
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4) % 16
    got = decode_image(_bmp8(idx, palette))
    assert np.array_equal(got, palette[idx])


def test_unknown_formats_raise_not_implemented():
    # JPEG and GIF now decode (analytics/jpeg.py, analytics/gif.py); a
    # malformed payload under a known signature is a ValueError, an
    # unrecognized format NotImplementedError
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises((ValueError, IndexError)):
        decode_image(b"GIF89a but malformed")
    with pytest.raises(NotImplementedError):
        decode_image(b"II*\x00 tiff is not supported")


def test_resize_nearest_neighbor():
    img = _img(8, 6, 3, seed=4)
    out = decode_image(resize_image(encode_netpbm(img), width=3, height=4))
    assert out.shape == (4, 3, 3)
    # nearest-neighbor: output pixel (r, c) = input (r*8//4, c*6//3)
    assert np.array_equal(out, img[(np.arange(4) * 8) // 4][:, (np.arange(3) * 6) // 3])


def test_image_meta_through_spark(spark):
    rgb = _img(4, 5, 3, seed=5)
    gray = _img(3, 2, 1, seed=6)
    rows = [
        Row(doc_id=1, payload=bytearray(encode_netpbm(rgb))),
        Row(doc_id=2, payload=bytearray(encode_netpbm(gray))),
        Row(doc_id=3, payload=bytearray(_bmp24(_img(2, 2, 3, seed=7)))),
        Row(doc_id=4, payload=bytearray(b"\x89PNG poison")),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.asDict() for r in image_meta(media).collect()}
    assert got[1]["format"] == "ppm" and (got[1]["width"], got[1]["height"]) == (5, 4)
    f = rgb.astype(np.float64)
    want_luma = (0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]).mean()
    assert abs(got[1]["mean_luma"] - want_luma) < 1e-9
    assert got[2]["format"] == "pgm" and got[2]["channels"] == 1
    assert abs(got[2]["mean_luma"] - gray.mean()) < 1e-9
    assert got[3]["format"] == "bmp"
    # poison payload degrades, doesn't kill the task
    assert got[4]["format"] == "unknown" and got[4]["mean_luma"] is None


def test_png_round_trip_all_filters_and_color_types(spark):
    import numpy as np

    from audit_star_spark.analytics.multimodal import decode_image, encode_png

    rng = np.random.default_rng(7)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, size=(9, 13, c), dtype=np.uint8)
        for f in range(5):
            out = decode_image(encode_png(img, filter_type=f))
            assert out.shape == img.shape, (c, f)
            assert (out == img).all(), (c, f)


def test_png_palette_decode():
    import zlib

    import numpy as np

    from audit_star_spark.analytics.multimodal import _PNG_SIG, decode_image

    # hand-build a 2x2 color-type-3 (palette) PNG: indices 0..3 -> palette
    pal = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 3])  # filter 0 rows
    idat = zlib.compress(raw)

    def chunk(t, b):
        return len(b).to_bytes(4, "big") + t + b + zlib.crc32(t + b).to_bytes(4, "big")

    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    png = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    out = decode_image(png)
    assert out.shape == (2, 2, 3)
    assert out[0, 1].tolist() == [40, 50, 60]
    assert out[1, 1].tolist() == [100, 110, 120]


def test_baseline_jpeg_now_decodes():
    import numpy as np

    from audit_star_spark.analytics.jpeg import encode_jpeg
    from audit_star_spark.analytics.multimodal import decode_image

    img = np.full((8, 16, 1), 123, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_jpeg(img, quality=100)), img)


def test_extract_features_empty_payload_degrades(spark):
    from audit_star_spark.analytics.multimodal import extract_features

    rows = [(0, bytearray(b"")), (1, bytearray(b"abc"))]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert out[0]["n_bytes"] == 0 and out[0]["head_mean"] == 0.0
    assert out[1]["n_bytes"] == 3


def test_audio_resample_roundtrip_and_semantics(spark):
    """Decimation by 2 of a known waveform: block means, int16 rounding,
    re-encoded payload decodes at the new rate with the new length; rms
    matches a direct numpy model; stereo downmixes to mono first."""
    import numpy as np

    from audit_star_spark.analytics.multimodal import (
        audio_resample,
        encode_wav,
        audio_meta,
    )

    s = np.array([100, 200, -100, -200, 301, 300, 7, -8, 5], dtype="<i2")
    stereo = np.array([10, 30, 50, 70], dtype="<i2")  # L/R interleaved
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(s, 16000))),
            (2, bytearray(encode_wav(stereo, 16000, channels=2))),
            (3, bytearray(b"\x00poison")),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in audio_resample(media, factor=2).collect()}
    # doc 1: blocks (100,200),(−100,−200),(301,300),(7,−8) -> 150,-150,301,-1
    # (300.5 and −0.5 round half-AWAY-FROM-ZERO: 301 and −1; trailing 5
    # dropped)
    want = np.array([150, -150, 301, -1], dtype=np.float64)
    assert rows[1]["n_samples"] == 4 and rows[1]["sample_rate"] == 8000
    assert rows[1]["rms"] == pytest.approx(float(np.sqrt((want**2).mean())))
    # re-decoded payload agrees
    meta = {
        r["doc_id"]: r
        for r in audio_meta(
            spark.createDataFrame(
                [(1, rows[1]["payload"])], "doc_id long, payload binary"
            )
        ).collect()
    }
    assert meta[1]["sample_rate"] == 8000 and meta[1]["n_samples"] == 4
    assert meta[1]["rms"] == pytest.approx(rows[1]["rms"])
    # doc 2: mono downmix (20, 60) -> one block mean 40
    assert rows[2]["n_samples"] == 1 and rows[2]["rms"] == pytest.approx(40.0)
    # doc 3: poison degrades
    assert rows[3]["payload"] is None and rows[3]["rms"] is None
    with pytest.raises(ValueError, match="factor"):
        audio_resample(media, factor=0)


def test_image_patches_model_and_edges(spark):
    """Patch statistics against a direct numpy model; remainder pixels
    crop; undersized and poison images contribute zero rows."""
    import numpy as np

    from audit_star_spark.analytics.multimodal import (
        encode_netpbm,
        image_patches,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (10, 18, 1), dtype=np.uint8)  # crops to 8x16
    tiny = np.zeros((4, 4, 1), dtype=np.uint8)  # smaller than one patch
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_netpbm(img))),
            (2, bytearray(encode_netpbm(tiny))),
            (3, bytearray(b"\x00poison")),
        ],
        "doc_id long, payload binary",
    )
    rows = image_patches(media, patch=8).collect()
    got = {(r["patch_row"], r["patch_col"]): r for r in rows if r["doc_id"] == 1}
    assert {r["doc_id"] for r in rows} == {1}
    assert set(got) == {(0, 0), (0, 1)}
    for (pr, pc), r in got.items():
        tile = img[pr * 8 : pr * 8 + 8, pc * 8 : pc * 8 + 8, 0].astype(float)
        assert r["mean_luma"] == pytest.approx(tile.mean())
        assert r["std_luma"] == pytest.approx(tile.std())
    with pytest.raises(ValueError, match="patch"):
        image_patches(media, patch=0)


def test_audio_resample_rational_441_to_160(spark):
    """44.1 kHz -> 16 kHz (up=160, down=441): result equals an
    independent numpy restatement of the documented kernel (trailing
    boxcar w=2, linear interpolation at n*441/160, half-away rounding)."""
    import numpy as np

    from audit_star_spark.analytics.multimodal import (
        _parse_wav,
        audio_resample_rational,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    s = (rng.integers(-3000, 3000, size=4410)).astype("<i2")
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, 44100)))], "doc_id long, payload binary"
    )
    row = audio_resample_rational(media, up=160, down=441).collect()[0]
    assert row["sample_rate"] == 16000

    # independent reference
    f = s.astype(np.float64)
    w = 441 // 160  # 2
    f = np.array([f[i : i + w].mean() for i in range(len(f) - w + 1)])
    n_out = (len(f) - 1) * 160 // 441 + 1
    want = []
    for n in range(n_out):
        i, rem = divmod(n * 441, 160)
        frac = rem / 160
        hi = min(i + 1, len(f) - 1)
        v = f[i] * (1 - frac) + f[hi] * frac
        want.append(int(np.clip(np.sign(v) * np.floor(abs(v) + 0.5), -32768, 32767)))
    _, _, got = _parse_wav(bytes(row["payload"]))
    assert row["n_samples"] == n_out
    assert list(got) == want


def test_audio_resample_rational_upsample_exact_on_ramp(spark):
    """Pure upsampling (8 kHz -> 12 kHz, up=3, down=2): no prefilter,
    and linear interpolation reproduces a linear ramp EXACTLY at the
    rational positions — closed form out[n] = a + b * (2n/3)."""
    import numpy as np

    from audit_star_spark.analytics.multimodal import (
        _parse_wav,
        audio_resample_rational,
        encode_wav,
    )

    a, b = -600.0, 9.0
    s = (a + b * np.arange(200)).astype("<i2")
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, 8000)))], "doc_id long, payload binary"
    )
    row = audio_resample_rational(media, up=3, down=2).collect()[0]
    assert row["sample_rate"] == 12000
    _, _, got = _parse_wav(bytes(row["payload"]))
    n_out = (200 - 1) * 3 // 2 + 1
    assert len(got) == n_out
    for n in (0, 1, 2, 3, 100, n_out - 1):
        v = a + b * (n * 2 / 3)
        exp = int(np.sign(v) * np.floor(abs(v) + 0.5))
        assert got[n] == exp


def test_audio_resample_rational_integer_equivalence(spark):
    """up=1 reduces to the integer boxcar path bit-for-bit."""
    import numpy as np

    from audit_star_spark.analytics.multimodal import (
        _parse_wav,
        audio_resample,
        audio_resample_rational,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    s = (rng.integers(-20000, 20000, size=997)).astype("<i2")
    stereo = np.column_stack([s, np.roll(s, 3)]).reshape(-1).astype("<i2")
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(s, 48000))),
            (2, bytearray(encode_wav(stereo, 48000, channels=2))),
        ],
        "doc_id long, payload binary",
    )
    a = {r["doc_id"]: r for r in audio_resample(media, factor=3).collect()}
    b = {
        r["doc_id"]: r
        for r in audio_resample_rational(media, up=1, down=3).collect()
    }
    for d in (1, 2):
        assert a[d]["sample_rate"] == b[d]["sample_rate"] == 16000
        sa = _parse_wav(bytes(a[d]["payload"]))[2]
        sb = _parse_wav(bytes(b[d]["payload"]))[2]
        assert np.array_equal(sa, sb)
        # gcd reduction: 2/6 == 1/3
        c = {
            r["doc_id"]: r
            for r in audio_resample_rational(media, up=2, down=6).collect()
        }
        sc = _parse_wav(bytes(c[d]["payload"]))[2]
        assert np.array_equal(sa, sc)


def test_audio_resample_rational_degrades_and_validates(spark):
    import numpy as np

    from audit_star_spark.analytics.multimodal import (
        audio_resample_rational,
        encode_wav,
    )
    import pytest

    s = np.arange(100, dtype="<i2")
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(s, 44100))),
            (2, bytearray(b"RIFFgarbage")),
        ],
        "doc_id long, payload binary",
    )
    # 44100 / 8 = 5512.5 is not an integer -> degrade, like poison
    rows = {
        r["doc_id"]: r
        for r in audio_resample_rational(media, up=1, down=8).collect()
    }
    assert rows[1]["payload"] is None and rows[2]["payload"] is None
    with pytest.raises(ValueError, match="up and down"):
        audio_resample_rational(media, up=0, down=2)


# ------------------------------------------------------- Y4M (yuv4mpeg)


def test_y4m_roundtrip_mono_and_444():
    import numpy as np

    from audit_star_spark.analytics.multimodal import encode_y4m, parse_y4m

    frames = [np.full((4, 6), v, np.uint8) for v in (0, 127, 255)]
    m = parse_y4m(encode_y4m(frames, fps=(30000, 1001), colorspace="Cmono"))
    assert (m["width"], m["height"]) == (6, 4)
    assert (m["fps_num"], m["fps_den"]) == (30000, 1001)
    assert m["colorspace"] == "Cmono" and m["n_frames"] == 3
    for y, v in zip(m["y_planes"], (0, 127, 255)):
        assert (y == v).all()

    color = [
        np.stack([np.full((4, 6), 9, np.uint8)] * 3) for _ in range(2)
    ]
    m = parse_y4m(encode_y4m(color, fps=(25, 1), colorspace="C444"))
    assert m["colorspace"] == "C444" and m["n_frames"] == 2
    assert all((y == 9).all() for y in m["y_planes"])


def test_y4m_420_stride_walk():
    """A hand-built C420jpeg stream: the parser must skip the
    half-resolution chroma planes exactly (1.5 * w * h per frame)."""
    import numpy as np

    from audit_star_spark.analytics.multimodal import parse_y4m

    w, h = 4, 2
    head = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n"
    f0 = b"FRAME\n" + bytes([10] * (w * h)) + bytes([99] * (w * h // 2))
    f1 = b"FRAME\n" + bytes([20] * (w * h)) + bytes([99] * (w * h // 2))
    m = parse_y4m(head + f0 + f1)
    assert m["n_frames"] == 2
    assert (m["y_planes"][0] == 10).all() and (m["y_planes"][1] == 20).all()
    assert m["y_planes"][0].shape == (2, 4)


def test_y4m_default_colorspace_is_420jpeg():
    from audit_star_spark.analytics.multimodal import parse_y4m

    m = parse_y4m(b"YUV4MPEG2 W2 H2 F1:1\n" + b"FRAME\n" + bytes(6))
    assert m["colorspace"] == "C420jpeg" and m["n_frames"] == 1


def test_y4m_poison_payloads_raise():
    import pytest as _pytest

    from audit_star_spark.analytics.multimodal import parse_y4m

    for bad in (
        b"",
        b"RIFFxxxx",
        b"YUV4MPEG2 W2 H2 C444\n" + b"FRAME\n" + bytes(5),  # truncated
        b"YUV4MPEG2 F25:1\n",  # missing W/H
        b"YUV4MPEG2 W2 H2 C999\n",  # unknown colorspace
        b"YUV4MPEG2 W2 H2 Cmono\nXRAME\n" + bytes(4),  # bad marker
    ):
        with _pytest.raises(ValueError):
            parse_y4m(bad)


def test_y4m_frame_means_operator(spark):
    import numpy as np

    from audit_star_spark.analytics.multimodal import (
        encode_y4m,
        y4m_frame_means,
    )

    payload = encode_y4m(
        [np.full((2, 2), 7, np.uint8), np.full((2, 2), 8, np.uint8)],
        fps=(25, 1),
    )
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"not video"))],
        "doc_id long, payload binary",
    )
    rows = sorted(
        (r["doc_id"], r["frame_idx"], r["mean_y"])
        for r in y4m_frame_means(df).collect()
    )
    assert rows == [(1, 0, 7.0), (1, 1, 8.0)]


# ------------------------------------------------------- G.711 (mu/A-law)


def test_g711_tables_match_spec_properties():
    import numpy as np

    from audit_star_spark.analytics.multimodal import _g711_table

    u = _g711_table("ulaw")
    a = _g711_table("alaw")
    assert u.dtype == np.int16 and a.dtype == np.int16
    # mu-law: 0xFF decodes to 0, 0x7F to -0 (also 0); extremes at 0x80/0x00
    assert u[0xFF] == 0 and u[0x7F] == 0
    assert u[0x80] == 32124 and u[0x00] == -32124
    # sign symmetry: byte b and b^0x80 decode to negatives of each other
    b = np.arange(256)
    assert (u[b] == -u[b ^ 0x80]).all()
    assert (a[b] == -a[b ^ 0x80]).all()
    # A-law extremes per spec: |max| = 0xF08 << 3 = 32256? no — seg 7,
    # mant 15: ((15<<4)+0x108) << 6 = 0x7D00 = 32000? compute: 504 << 6
    assert a.max() == ((15 << 4) + 0x108) << 6
    assert a.min() == -a.max()


def test_g711_wav_roundtrip_through_parse_wav():
    import numpy as np

    from audit_star_spark.analytics.multimodal import (
        _g711_table,
        _parse_wav,
        encode_wav_g711,
    )

    raw = bytes(range(256))
    for law, code in (("ulaw", 7), ("alaw", 6)):
        rate, ch, samples = _parse_wav(encode_wav_g711(raw, 8000, law))
        assert (rate, ch) == (8000, 1)
        assert (samples == _g711_table(law)[np.frombuffer(raw, np.uint8)]).all()


def test_g711_odd_payload_pads_even_chunk():
    from audit_star_spark.analytics.multimodal import (
        _parse_wav,
        encode_wav_g711,
    )

    rate, ch, samples = _parse_wav(encode_wav_g711(b"\x01\x02\x03", 8000, "ulaw"))
    assert len(samples) == 3


def test_g711_stats_operator_ignores_pcm_and_poison(spark):
    import numpy as np

    from audit_star_spark.analytics.multimodal import (
        encode_wav,
        encode_wav_g711,
        g711_sample_stats,
    )

    g = encode_wav_g711(bytes([0xFF, 0x00]), 8000, "ulaw")
    pcm = encode_wav(np.array([1, 2, 3], dtype=np.int16), 8000)
    df = spark.createDataFrame(
        [(1, bytearray(g)), (2, bytearray(pcm)), (3, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    rows = g711_sample_stats(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["law"], r["n_samples"]) == (1, "ulaw", 2)
    assert r["sum_linear"] == 0 + (-32124)
    assert (r["min_linear"], r["max_linear"]) == (-32124, 0)
