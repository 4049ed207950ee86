"""Baseline JPEG codec: bit-exact DC gate contract, bounded lossy error,
coefficient-exact AC decode vectors, and degrade paths."""

import numpy as np
import pytest

from audit_star_spark.analytics.jpeg import (
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _C,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _ZIG_COLS,
    _ZIG_ROWS,
    _BitWriter,
    _canonical_codes,
    _category,
    _dht_seg,
    _dqt_seg,
    _seg,
    decode_jpeg,
    encode_jpeg,
)

RNG = np.random.default_rng(11)


def test_constant_tiles_bit_exact_q100():
    """The driver-gate contract: at quality=100 every quant entry is 1 and
    a constant 8x8 tile is DC-only with an exact integer coefficient, so
    decode(encode(img)) must be byte-identical."""
    tiles = RNG.integers(0, 256, (4, 5), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)[:, :, None]
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)


def test_random_gray_q100_error_bound():
    img = RNG.integers(0, 256, (40, 56, 1), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(img, quality=100))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4


def test_color_444_round_trip_and_odd_dims():
    img = RNG.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(img, quality=100))
    assert got.shape == (13, 21, 3)
    # YCbCr forward+inverse rounding costs a couple of levels at q=100
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 6


def test_lossy_quality_is_close_on_smooth_content():
    x, y = np.arange(64)[None, :], np.arange(48)[:, None]
    img = np.clip(100 + x + y, 0, 255).astype(np.uint8)[:, :, None]
    got = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 3


def _handmade_jpeg(zz_blocks: list[list[int]], w: int, h: int) -> bytes:
    """Grayscale baseline JPEG with the given zigzag coefficient blocks
    written directly through the Huffman path — no FDCT, no rounding, so
    the decoder's output must equal the IDCT of these exact coefficients."""
    qt = np.ones((8, 8), dtype=np.int64)
    head = bytearray(b"\xff\xd8")
    head += _dqt_seg(0, qt)
    head += _seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    head += _dht_seg(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    head += _dht_seg(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    head += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bw = _BitWriter()
    pred = 0
    for zz in zz_blocks:
        diff = zz[0] - pred
        pred = zz[0]
        size = _category(abs(diff))
        code, ln = dc_codes[size]
        bw.write(code, ln)
        if size:
            bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for i in range(1, last_nz + 1):
            v = zz[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                bw.write(code, ln)
                run -= 16
            size = _category(abs(v))
            code, ln = ac_codes[(run << 4) | size]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if last_nz < 63:
            code, ln = ac_codes[0x00]
            bw.write(code, ln)
    return bytes(head) + bw.flush() + b"\xff\xd9"


def _idct_model(zz: list[int]) -> np.ndarray:
    f = np.zeros((8, 8))
    f[_ZIG_ROWS, _ZIG_COLS] = zz
    return np.clip(np.round(_C.T @ f @ _C + 128.0), 0, 255).astype(np.uint8)


def test_ac_decode_coefficient_exact_vectors():
    """Hand-encoded coefficient blocks exercise every AC branch — short
    runs, ZRL (16-zero run), a coefficient at index 63 (no EOB), negative
    values, large DC differentials — and the decoded pixels must equal an
    independent IDCT of those exact coefficients."""
    b1 = [0] * 64
    b1[0], b1[1], b1[5], b1[9] = 80, -31, 17, 6  # short runs, signs
    b2 = [0] * 64
    b2[0], b2[20], b2[63] = -100, 12, -5  # ZRL territory + last index, no EOB
    b3 = [0] * 64
    b3[0] = 500  # big DC step after a negative predecessor
    blocks = [b1, b2, b3]
    payload = _handmade_jpeg(blocks, w=24, h=8)
    got = decode_jpeg(payload)
    assert got.shape == (8, 24, 1)
    for i, zz in enumerate(blocks):
        want = _idct_model(zz)
        assert np.array_equal(got[:, i * 8 : (i + 1) * 8, 0], want), f"block {i}"


def test_progressive_and_garbage_raise():
    img = RNG.integers(0, 256, (8, 8, 1), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img, quality=100))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\x00\x00garbage")


def test_image_meta_decodes_jpeg_and_degrades_on_truncation(spark):
    from audit_star_spark.analytics.multimodal import image_meta

    img = np.full((16, 8, 1), 77, dtype=np.uint8)
    good = encode_jpeg(img, quality=100)
    rows = [(0, bytearray(good)), (1, bytearray(good[:40]))]  # 1 = truncated
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in image_meta(media).collect()}
    assert out[0]["format"] == "jpeg"
    assert (out[0]["width"], out[0]["height"], out[0]["channels"]) == (8, 16, 1)
    assert out[0]["mean_luma"] == 77.0
    assert out[1]["format"] == "unknown" and out[1]["width"] is None
