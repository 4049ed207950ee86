"""GIF codec (analytics/gif.py): LZW roundtrips incl. width growth and
12-bit reset, interlace, palettes, multi-frame, poison degradation, and
the image_meta surface."""

import numpy as np
import pytest

from audit_star_spark.analytics.gif import (
    decode_gif,
    encode_gif,
    parse_gif,
)

RNG = np.random.default_rng(17)


def test_grayscale_roundtrip_exact():
    img = RNG.integers(0, 256, (13, 21, 1), dtype=np.uint8)
    out = decode_gif(encode_gif(img))
    assert out.shape == (13, 21, 3)
    for ch in range(3):  # identity palette: every channel equals the gray
        assert np.array_equal(out[:, :, ch], img[:, :, 0])


def test_rgb_palette_roundtrip_exact():
    colors = RNG.integers(0, 256, (40, 3), dtype=np.uint8)
    img = colors[RNG.integers(0, 40, (9, 7))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    with pytest.raises(ValueError, match="256 distinct"):
        big = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        encode_gif(big)  # ~1000 distinct colors


def test_interlace_roundtrip_exact():
    img = RNG.integers(0, 256, (17, 5, 1), dtype=np.uint8)
    out = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(out[:, :, 0], img[:, :, 0])


def test_lzw_12bit_growth_and_reset():
    """> 4096 pixels forces the code width to 12 bits and through the
    encoder's clear-and-reset path; decode must stay exact."""
    img = RNG.integers(0, 256, (80, 70, 1), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img))[:, :, 0], img[:, :, 0])


def test_multi_frame_first_returned_and_counted():
    img = RNG.integers(0, 256, (6, 6, 1), dtype=np.uint8)
    frame, n = parse_gif(encode_gif(img, n_frames=3))
    assert n == 3
    assert np.array_equal(frame[:, :, 0], img[:, :, 0])


def test_extension_blocks_are_skipped():
    """Insert a graphics-control extension before the image descriptor —
    the 89a structure real encoders emit."""
    img = RNG.integers(0, 256, (4, 4, 1), dtype=np.uint8)
    data = bytearray(encode_gif(img))
    desc = 6 + 7 + 768  # header + LSD + 256-entry global table
    assert data[desc] == 0x2C
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, 4-byte block, term
    patched = bytes(data[:desc]) + ext + bytes(data[desc:])
    assert np.array_equal(decode_gif(patched)[:, :, 0], img[:, :, 0])


def test_poison_payloads_raise_for_decoder_degrade(spark):
    from audit_star_spark.analytics.multimodal import image_meta

    img = RNG.integers(0, 256, (5, 5, 1), dtype=np.uint8)
    good = encode_gif(img)
    for bad in (b"GIF89a" + b"\x00" * 5, good[:30], good[:-10]):
        with pytest.raises((ValueError, IndexError)):
            decode_gif(bad)
    # and through Spark: degrade, never raise
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[:25]))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in image_meta(media).collect()}
    assert rows[1]["format"] == "gif" and rows[1]["width"] == 5
    assert rows[2]["format"] == "unknown" and rows[2]["width"] is None
