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
    # SOS arriving before any SOF must raise the documented ValueError,
    # not a TypeError from subscripting a missing frame
    no_sof = bytearray(encode_jpeg(img, quality=100))
    sof = no_sof.find(b"\xff\xc0")
    seglen = int.from_bytes(no_sof[sof + 2 : sof + 4], "big")
    del no_sof[sof : sof + 2 + seglen]
    with pytest.raises(ValueError, match="SOS before SOF"):
        decode_jpeg(bytes(no_sof))


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


def test_restart_markers_reset_dc_prediction():
    """DRI/RSTn path: a grayscale file with restart interval 2 — the
    writer byte-aligns and resets the DC predictor at each RST, so a
    decoder that failed to do the same would mis-predict every block
    after the first marker."""
    qt = np.ones((8, 8), dtype=np.int64)
    w, h, ri = 48, 8, 2  # 6 blocks, RST after every 2
    head = bytearray(b"\xff\xd8")
    head += _dqt_seg(0, qt)
    head += _seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    head += _dht_seg(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    head += _dht_seg(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    head += _seg(0xDD, (ri).to_bytes(2, "big"))  # DRI
    head += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    # constant blocks with distinct values: DC diff coding crosses each
    # restart boundary where prediction must restart from 0
    values = [40, 200, 90, 15, 250, 128]
    bw = _BitWriter()
    pred = 0
    for i, val in enumerate(values):
        if i and i % ri == 0:
            pad = (8 - bw.nbits) % 8
            if pad:
                bw.write((1 << pad) - 1, pad)
            bw.out += bytes([0xFF, 0xD0 + ((i // ri - 1) % 8)])  # RSTn, unstuffed
            pred = 0
        dc = 8 * (val - 128)  # exact DC of a constant block at qt=1
        diff = dc - pred
        pred = dc
        size = _category(abs(diff))
        code, ln = dc_codes[size]
        bw.write(code, ln)
        if size:
            bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    payload = bytes(head) + bw.flush() + b"\xff\xd9"
    got = decode_jpeg(payload)
    assert got.shape == (8, 48, 1)
    for i, val in enumerate(values):
        blk = got[:, i * 8 : (i + 1) * 8, 0]
        assert np.all(blk == val), (i, val, np.unique(blk))


def test_420_chroma_subsampling_decodes():
    """4:2:0 path: hand-encode a 16x16 color image as one MCU (four Y
    blocks + one Cb + one Cr at half resolution). Constant planes make
    every block DC-only and exact, so the decoded RGB must equal the
    closed-form YCbCr inverse."""
    y_val, cb_val, cr_val = 120, 90, 160
    qt = np.ones((8, 8), dtype=np.int64)
    head = bytearray(b"\xff\xd8")
    head += _dqt_seg(0, qt)
    head += _seg(
        0xC0,
        bytes([8]) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    head += _dht_seg(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    head += _dht_seg(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    head += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}

    def put_block(cid, val):
        dc = 8 * (val - 128)
        diff = dc - preds[cid]
        preds[cid] = dc
        size = _category(abs(diff))
        code, ln = dc_codes[size]
        bw.write(code, ln)
        if size:
            bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        code, ln = ac_codes[0x00]
        bw.write(code, ln)

    for _ in range(4):  # Y blocks of the single MCU (2x2)
        put_block(1, y_val)
    put_block(2, cb_val)
    put_block(3, cr_val)
    payload = bytes(head) + bw.flush() + b"\xff\xd9"
    got = decode_jpeg(payload)
    assert got.shape == (16, 16, 3)
    r = int(np.clip(round(y_val + 1.402 * (cr_val - 128)), 0, 255))
    g = int(np.clip(round(y_val - 0.344136 * (cb_val - 128) - 0.714136 * (cr_val - 128)), 0, 255))
    b = int(np.clip(round(y_val + 1.772 * (cb_val - 128)), 0, 255))
    assert np.all(got == np.array([r, g, b], dtype=np.uint8)), got[0, 0]


def test_corrupted_payloads_always_degrade_in_image_meta(spark):
    """Poison-payload robustness at the operator level: byte-flipped
    JPEGs raise a whole zoo (fuzzing surfaced KeyError from missing
    Huffman table ids, TypeError, StopIteration beyond ValueError /
    IndexError) — image_meta must degrade EVERY such row to
    format='unknown', never propagate into the Spark task."""
    import random

    img = RNG.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    good = bytearray(encode_jpeg(img, quality=90))
    random.seed(5)
    rows = []
    for i in range(60):
        p = bytearray(good)
        for _ in range(random.randint(1, 4)):
            p[random.randrange(len(p))] = random.randrange(256)
        rows.append((i, p))
    from audit_star_spark.analytics.multimodal import image_meta

    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = image_meta(media).collect()  # must not raise
    assert len(out) == 60
    assert {r["format"] for r in out} <= {"jpeg", "unknown"}


# ---------------------------------------------------------- progressive
def test_progressive_decode_matches_baseline_exactly():
    """All scans together transmit exactly the baseline coefficients, so
    progressive and baseline decodes must agree bit-for-bit at ANY
    quality — grayscale and color, odd dimensions included."""
    from audit_star_spark.analytics.jpeg import encode_jpeg_progressive

    for shape, q in [((16, 16, 1), 100), ((13, 21, 1), 85), ((19, 14, 3), 90)]:
        img = RNG.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
        assert prog.shape == base.shape
        assert np.array_equal(prog, base), (shape, q)


def test_progressive_constant_tiles_bit_exact_and_eob_runs():
    """Tile-constant image at quality=100: every AC band is zero, so the
    encoder emits multi-block EOB runs (EOBn, r > 0) — the decode path a
    single-block EOB never reaches — and the decode must still be
    bit-exact against the source."""
    from audit_star_spark.analytics.jpeg import encode_jpeg_progressive

    img = np.zeros((32, 32, 1), dtype=np.uint8)
    for ty in range(4):
        for tx in range(4):
            img[ty * 8 : ty * 8 + 8, tx * 8 : tx * 8 + 8] = 13 + 16 * (ty * 4 + tx)
    payload = encode_jpeg_progressive(img, quality=100)
    assert np.array_equal(decode_jpeg(payload), img)


def test_progressive_smooth_gradient_close():
    from audit_star_spark.analytics.jpeg import encode_jpeg_progressive

    x = np.linspace(0, 255, 24)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)[:, :, None]
    out = decode_jpeg(encode_jpeg_progressive(img, quality=95))
    assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 12


def test_corrupted_progressive_payloads_always_degrade(spark):
    """Same poison-payload contract for the new SOF2 path: byte-flipped
    and truncated progressive JPEGs must degrade in image_meta, never
    propagate an exception into the task."""
    import random

    from audit_star_spark.analytics.jpeg import encode_jpeg_progressive
    from audit_star_spark.analytics.multimodal import image_meta

    img = RNG.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    good = bytearray(encode_jpeg_progressive(img, quality=90))
    random.seed(6)
    rows = []
    for i in range(40):
        p = bytearray(good)
        for _ in range(random.randint(1, 4)):
            p[random.randrange(len(p))] = random.randrange(256)
        rows.append((i, p))
    for i in range(40, 60):  # truncations
        rows.append((i, bytearray(good[: random.randrange(2, len(good))])))
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = image_meta(media).collect()  # must not raise
    assert len(out) == 60
    assert {r["format"] for r in out} <= {"jpeg", "unknown"}


def test_progressive_refine_zrl_past_16_zeros_bit_exact():
    """Regression (r4 advice): in the AC refinement scan the ZRL loop must
    run on arrival at ANY nonzero-history coefficient, not only at
    newly-nonzero ones. A block with a previously-nonzero (abs >= 2)
    coefficient beyond the 16th pending zero plus a later abs == 1
    coefficient used to emit the deferred ZRL with ALL pending correction
    bits flushed after it — but the decoder's ZRL advance stops at the
    16th zero and expects that correction bit after the NEXT symbol, so
    the stream decoded to wrong pixels (or raised). Every crafted pattern
    must decode bit-identically to the baseline encoding."""
    from audit_star_spark.analytics.jpeg import encode_jpeg_progressive

    patterns = [
        {20: 3, 40: 1},  # the verified repro: t>1 at 19 pending zeros
        {1: 5, 20: 3, 40: 1},  # early t>1, then the deferred-ZRL shape
        {5: 3, 40: 2, 62: 1},  # two ZRLs needed before a far t>1
        {2: 2, 25: 2, 45: 1},  # two previously-nonzero past the span
        {20: -3, 40: -1},  # negative values, same run shape
        {10: 1, 30: 3},  # t>1 AFTER the last new bit folds into EOB run
    ]
    for coeffs in patterns:
        zz = [0] * 64
        for k, v in coeffs.items():
            zz[k] = v
        img = _idct_model(zz)[:, :, None]
        base = decode_jpeg(encode_jpeg(img, quality=100))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=100))
        assert np.array_equal(prog, base), coeffs


def test_progressive_random_sparse_blocks_bit_exact():
    """Randomized differential sweep over sparse coefficient blocks —
    many zero-run / refinement-bit interleavings, far beyond the crafted
    regression patterns — progressive must always equal baseline."""
    from audit_star_spark.analytics.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(41)
    for _ in range(60):
        zz = [0] * 64
        for k in rng.choice(63, size=rng.integers(1, 7), replace=False):
            zz[int(k) + 1] = int(rng.integers(1, 6)) * (1 if rng.random() < 0.5 else -1)
        img = _idct_model(zz)[:, :, None]
        base = decode_jpeg(encode_jpeg(img, quality=100))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=100))
        assert np.array_equal(prog, base), zz


# ----------------------------------------------------- 12-bit precision


def test_jpeg12_constant_tiles_roundtrip_exact():
    """quality=100 clamps quant to 1; tile-constant 12-bit images decode
    bit-exactly (the same differential contract as the 8-bit gate)."""
    import numpy as np

    from audit_star_spark.analytics.jpeg import decode_jpeg, encode_jpeg12

    tiles = np.array([[100, 2048], [4095, 3000]], dtype=np.uint16)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)[:, :, None]
    got = decode_jpeg(encode_jpeg12(img, quality=100))
    assert got.dtype == np.uint16
    assert np.array_equal(got, img)
    assert got.max() == 4095  # true 12-bit dynamic range survives


def test_jpeg12_rgb_roundtrip_close():
    import numpy as np

    from audit_star_spark.analytics.jpeg import decode_jpeg, encode_jpeg12

    rng = np.random.default_rng(13)
    base = rng.integers(256, 3840, size=(2, 2, 3), dtype=np.uint16)
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)
    got = decode_jpeg(encode_jpeg12(img, quality=100))
    assert got.dtype == np.uint16 and got.shape == img.shape
    # YCbCr roundtrip rounding only: within 2 counts out of 4096
    assert np.max(np.abs(got.astype(np.int64) - img.astype(np.int64))) <= 2


def test_jpeg12_gradient_quantized_close_and_8bit_unchanged():
    import numpy as np

    from audit_star_spark.analytics.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg12,
    )

    x = np.linspace(0, 4095, 32)
    img12 = (x[None, :] * np.ones((24, 1))).astype(np.uint16)[:, :, None]
    got = decode_jpeg(encode_jpeg12(img12, quality=95))
    err = np.abs(got.astype(np.float64) - img12.astype(np.float64))
    assert err.mean() < 32  # smooth ramp survives quantization
    # the 8-bit path still returns uint8
    img8 = (img12 >> 4).astype(np.uint8)
    got8 = decode_jpeg(encode_jpeg(img8, quality=95))
    assert got8.dtype == np.uint8


def test_jpeg12_validation():
    import numpy as np
    import pytest

    from audit_star_spark.analytics.jpeg import encode_jpeg12

    with pytest.raises(ValueError, match="0..4095"):
        encode_jpeg12(np.full((8, 8, 1), 5000, dtype=np.uint16))
    with pytest.raises(ValueError, match="channels"):
        encode_jpeg12(np.zeros((8, 8, 2), dtype=np.uint16))
