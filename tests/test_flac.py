"""FLAC codec (analytics/flac.py): encoder/decoder differentials over
every subframe path, hand-built vectors for LPC and stereo
decorrelation, residual escapes, and truncation behavior."""

import numpy as np
import pytest

from audit_star_spark.analytics.flac import (
    _BitWriter,
    encode_flac,
    parse_flac,
)


def test_roundtrip_constant_fixed_verbatim_paths():
    rng = np.random.default_rng(3)
    # block 0: constant; block 1: linear ramp (fixed-2 residuals = 0);
    # block 2: white noise (verbatim fallback)
    const = np.full(256, -1234, dtype=np.int64)
    ramp = np.arange(256, dtype=np.int64) * 7 - 300
    noise = rng.integers(-30000, 30000, size=256)
    s = np.concatenate([const, ramp, noise])
    payload = encode_flac(s, rate=16000, bps=16, block_size=256)
    rate, ch, bps, got = parse_flac(payload)
    assert (rate, ch, bps) == (16000, 1, 16)
    assert np.array_equal(got[:, 0], s)


def test_roundtrip_multichannel_and_partial_tail_block():
    rng = np.random.default_rng(5)
    n = 700  # 256 + 256 + 188 tail
    s = np.stack(
        [
            rng.integers(-2000, 2000, size=n),
            np.arange(n, dtype=np.int64) % 97 - 48,
        ],
        axis=1,
    )
    payload = encode_flac(s, rate=44100, bps=16, block_size=256)
    rate, ch, bps, got = parse_flac(payload)
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(got, s)


def test_roundtrip_8_and_24_bit_depths():
    rng = np.random.default_rng(9)
    s8 = rng.integers(-128, 128, size=300)
    r, c, b, got = parse_flac(encode_flac(s8, 8000, bps=8, block_size=128))
    assert b == 8 and np.array_equal(got[:, 0], s8)
    s24 = rng.integers(-(1 << 23), 1 << 23, size=300)
    r, c, b, got = parse_flac(encode_flac(s24, 96000, bps=24, block_size=128))
    assert b == 24 and np.array_equal(got[:, 0], s24)


def _hand_frame_stream(subframe_bits, channels=1, bps=16, rate=8000, n=8,
                       chan_assign=None):
    """Minimal STREAMINFO + ONE frame whose subframe section is supplied
    bit-by-bit — lets tests state LPC / decorrelation vectors by hand."""
    info = _BitWriter()
    info.write(n, 16); info.write(n, 16)
    info.write(0, 24); info.write(0, 24)
    info.write(rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    body = info.tobytes() + b"\x00" * 16
    out = bytearray(b"fLaC") + bytes([0x80]) + len(body).to_bytes(3, "big") + body
    w = _BitWriter()
    w.write(0x3FFE, 14); w.write(0, 1); w.write(0, 1)
    w.write(7, 4)  # 16-bit blocksize follows
    w.write(0, 4)  # rate from streaminfo
    w.write(chan_assign if chan_assign is not None else channels - 1, 4)
    w.write(0, 3); w.write(0, 1)
    w.write(0, 8)  # frame number 0
    w.write(n - 1, 16)
    w.write(0, 8)  # crc8
    for fn in subframe_bits:
        fn(w)
    w.align()
    w.write(0, 16)
    return bytes(out) + w.tobytes()


def test_lpc_subframe_hand_vector():
    """LPC order 2, coefs (3, -1), shift 1: s[i] = ((3*s[i-1] - s[i-2])
    >> 1) + r[i] — stated by hand, decoded by the real path."""
    warm = [100, 110]
    resid = [5, -3, 0, 7, -2, 1]
    expect = list(warm)
    for r in resid:
        expect.append(((3 * expect[-1] - 1 * expect[-2]) >> 1) + r)

    def sub(w):
        w.write(0, 1)
        w.write(32 + 1, 6)  # LPC order 2 -> type 33
        w.write(0, 1)  # no wasted bits
        w.write_signed(warm[0], 16)
        w.write_signed(warm[1], 16)
        w.write(5 - 1, 4)  # precision 5
        w.write_signed(1, 5)  # shift 1
        w.write_signed(3, 5)
        w.write_signed(-1, 5)
        w.write(0, 2)  # rice 4-bit
        w.write(0, 4)  # partition order 0
        w.write(3, 4)  # rice param 3
        for r in resid:
            w.write_rice(r, 3)

    payload = _hand_frame_stream([sub], n=8)
    rate, ch, bps, got = parse_flac(payload)
    assert list(got[:, 0]) == expect


@pytest.mark.parametrize(
    "assign", [8, 9, 10], ids=["left-side", "right-side", "mid-side"]
)
def test_stereo_decorrelation_hand_vectors(assign):
    left = np.array([100, -50, 3000, 7, -1, 0, 12, -32768], dtype=np.int64)
    right = np.array([90, -60, 2990, -7, 1, 0, 13, -32760], dtype=np.int64)

    def verbatim(vals, bits):
        def sub(w):
            w.write(0, 1); w.write(1, 6); w.write(0, 1)
            for v in vals:
                w.write_signed(int(v), bits)
        return sub

    side = left - right
    if assign == 8:
        subs = [verbatim(left, 16), verbatim(side, 17)]
    elif assign == 9:
        subs = [verbatim(side, 17), verbatim(right, 16)]
    else:
        mid = (left + right) >> 1
        subs = [verbatim(mid, 16), verbatim(side, 17)]
    payload = _hand_frame_stream(subs, channels=2, chan_assign=assign, n=8)
    rate, ch, bps, got = parse_flac(payload)
    assert np.array_equal(got[:, 0], left)
    assert np.array_equal(got[:, 1], right)


def test_residual_escape_partition():
    """Rice param 15 escapes to raw n-bit residuals."""
    warm = [10]
    resid = [1000, -2000, 3000, 4000, -4096, 4095, 0]

    def sub(w):
        w.write(0, 1)
        w.write(8 + 1, 6)  # FIXED order 1
        w.write(0, 1)
        w.write_signed(warm[0], 16)
        w.write(0, 2)
        w.write(0, 4)
        w.write(15, 4)  # escape
        w.write(13, 5)  # 13-bit raw residuals
        for r in resid:
            w.write_signed(r, 13)

    payload = _hand_frame_stream([sub], n=8)
    _, _, _, got = parse_flac(payload)
    expect = list(warm)
    for r in resid:
        expect.append(expect[-1] + r)
    assert list(got[:, 0]) == expect


def test_wasted_bits_shift():
    vals = [8, -16, 24, 0, 8, 8, -8, 16]  # all multiples of 8 = 3 wasted

    def sub(w):
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(1, 1)  # wasted flag
        w.write(0, 2)  # two more zeros -> unary 2 -> wasted = 3
        w.write(1, 1)
        for v in vals:
            w.write_signed(v >> 3, 13)  # bps 16 - 3

    payload = _hand_frame_stream([sub], n=8)
    _, _, _, got = parse_flac(payload)
    assert list(got[:, 0]) == vals


def test_truncation_and_poison_raise():
    s = np.arange(600, dtype=np.int64)
    payload = encode_flac(s, 8000, block_size=256)
    with pytest.raises(ValueError):
        parse_flac(payload[: len(payload) // 2])
    with pytest.raises(ValueError):
        parse_flac(b"fLaX" + payload[4:])
    with pytest.raises(ValueError):
        parse_flac(b"")
    # sample exceeding declared bps must be rejected, not emitted
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), 8000, bps=16)


def test_audio_meta_decodes_flac_through_spark(spark):
    """audio_meta dispatches FLAC by magic: rate/channels/duration/rms/
    zero-crossings equal the same features computed on the raw samples;
    WAV rows in the same batch are untouched."""
    from pyspark.sql import functions as F

    from audit_star_spark.analytics.multimodal import audio_meta, encode_wav

    rng = np.random.default_rng(21)
    mono = rng.integers(-20000, 20000, size=1000)
    stereo = np.stack([mono, np.roll(mono, 11)], axis=1)
    rows = [
        (1, bytearray(encode_flac(mono, 16000, block_size=256))),
        (2, bytearray(encode_flac(stereo, 44100, block_size=256))),
        (3, bytearray(encode_wav(mono.astype("<i2"), 8000))),
        (4, bytearray(b"fLaC<poison>")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_meta(df).collect()}
    f = mono.astype(np.float64)
    rms = float(np.sqrt(np.mean(f * f)))
    assert got[1]["format"] == "flac"
    assert (got[1]["sample_rate"], got[1]["n_channels"], got[1]["n_samples"]) == (
        16000, 1, 1000,
    )
    assert got[1]["rms"] == pytest.approx(rms)
    assert got[2]["format"] == "flac" and got[2]["n_channels"] == 2
    assert got[2]["n_samples"] == 1000
    assert got[3]["format"] == "wav" and got[3]["sample_rate"] == 8000
    assert got[4]["format"] == "unknown" and got[4]["rms"] is None
    # flac zero-crossings equal the closed-form sign-flip count
    zc = int(np.sum(f[1:] * f[:-1] < 0))
    assert got[1]["zero_crossings"] == zc
