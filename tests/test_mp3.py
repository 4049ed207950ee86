"""MP3 frame-header census (analytics/mp3.py): header walk arithmetic,
ID3 skipping, truncation/garbage tolerance, audio_meta surface. Sample
decode is out of scope by design — the census never touches payload
bytes past each header."""

import numpy as np
import pytest

from audit_star_spark.analytics.mp3 import (
    SAMPLES_PER_FRAME,
    encode_mp3_frames,
    parse_mp3,
)


def test_cbr_census_closed_form():
    info = parse_mp3(encode_mp3_frames([128] * 40, sample_rate=44100))
    assert info["n_frames"] == 40
    assert info["sample_rate"] == 44100 and info["channels"] == 2
    assert info["duration_s"] == pytest.approx(40 * 1152 / 44100)
    assert info["avg_bitrate_kbps"] == 128
    assert info["total_frame_bytes"] == 40 * ((144 * 128000) // 44100)


def test_vbr_average_and_mono():
    rates = [64, 128, 192, 320, 96, 96]
    info = parse_mp3(
        encode_mp3_frames(rates, sample_rate=32000, channels=1)
    )
    assert info["n_frames"] == len(rates)
    assert info["channels"] == 1
    assert info["avg_bitrate_kbps"] == pytest.approx(sum(rates) / len(rates))


def test_id3v2_prefix_and_trailing_garbage_skipped():
    payload = encode_mp3_frames([160] * 7, id3_bytes=500) + b"TAGtrailingv1junk"
    info = parse_mp3(payload)
    assert info["n_frames"] == 7


def test_truncated_tail_frame_dropped():
    full = encode_mp3_frames([128] * 5)
    info = parse_mp3(full[: len(full) - 10])
    assert info["n_frames"] == 4


def test_non_mpeg1_and_poison_raise():
    with pytest.raises(ValueError):
        parse_mp3(b"not audio at all")
    with pytest.raises(ValueError):
        parse_mp3(b"")
    # MPEG-2 version bits (10) must refuse, not misparse
    h = int.from_bytes(encode_mp3_frames([128])[:4], "big")
    h2 = (h & ~(0x3 << 19)) | (0b10 << 19)
    with pytest.raises(ValueError, match="MPEG-1"):
        parse_mp3(h2.to_bytes(4, "big") + bytes(400))


def test_audio_meta_mp3_census_through_spark(spark):
    from audit_star_spark.analytics.multimodal import audio_meta, encode_wav

    s = np.arange(500, dtype="<i2")
    rows = [
        (1, bytearray(encode_mp3_frames([128] * 10))),
        (2, bytearray(encode_wav(s, 8000))),
        (3, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_meta(df).collect()}
    assert got[1]["format"] == "mp3"
    assert got[1]["sample_rate"] == 44100
    assert got[1]["n_samples"] == 10 * SAMPLES_PER_FRAME
    assert got[1]["rms"] is None and got[1]["zero_crossings"] is None
    assert got[2]["format"] == "wav"
    assert got[3]["format"] == "unknown"


# --------------------------------------------- Layer II subband decode
from audit_star_spark.analytics.mp3 import (  # noqa: E402
    _b2a_row,
    _QCLASS,
    decode_mp3_layer2,
    encode_mp3_layer2,
    synthesize_mp3_pcm,
    SBLIMIT_B2A,
)


def _model_sprime(fr: dict) -> list[float]:
    """Independent requantization model straight off the frame SPEC dict
    (never touches the bitstream): the encode->decode differential's
    other side."""
    out = []
    for gr in range(12):
        part = gr // 4
        for sb in sorted(fr["alloc"]):
            idx = fr["alloc"][sb]
            if not idx:
                continue
            _, steps = _b2a_row(sb)
            n = steps[idx - 1]
            nb, grouped, _ = _QCLASS[n]
            scfsi, sfs = fr["scfsi"][sb], fr["sf"][sb]
            parts = {
                0: (sfs[0], sfs[1], sfs[2]) if scfsi == 0 else None,
                1: (sfs[0], sfs[0], sfs[1]) if scfsi == 1 else None,
                2: (sfs[0], sfs[0], sfs[0]) if scfsi == 2 else None,
                3: (sfs[0], sfs[1], sfs[1]) if scfsi == 3 else None,
            }[scfsi]
            sfidx = parts[part]
            entry = fr["codes"][sb][gr]
            codes = (
                (entry % n, (entry // n) % n, (entry // (n * n)) % n)
                if grouped
                else tuple(entry)
            )
            c_const = float(1 << nb) / n
            d_const = 1.0 - (n - 1) * 2.0 ** (-nb)
            factor = 2.0 ** (1.0 - sfidx / 3.0)
            for code in codes:
                out.append(factor * c_const * (code * 2.0 ** (1 - nb) - 1.0 + d_const))
    return out


def _make_frame(seed: int) -> dict:
    """Deterministic frame spec exercising grouped 3/5/9, ungrouped
    7/15/63, every scfsi mode and varied scalefactors."""
    fr = {"alloc": {}, "scfsi": {}, "sf": {}, "codes": {}}
    for sb in range(SBLIMIT_B2A):
        if (sb + seed) % 3:
            continue
        nbal, steps = _b2a_row(sb)
        m = min(len(steps), 6)
        idx = 1 + (((sb + seed) // 3) % m)
        n = steps[idx - 1]
        if n == 65535:  # keep synthetic frames inside the 192 kbps budget
            idx, n = 1, steps[0]
        nb, grouped, _ = _QCLASS[n]
        scfsi = (sb + seed) % 4
        count = {0: 3, 1: 2, 2: 1, 3: 2}[scfsi]
        fr["alloc"][sb] = idx
        fr["scfsi"][sb] = scfsi
        fr["sf"][sb] = [(2 * sb + 3 * seed + 11 * j) % 63 for j in range(count)]
        if grouped:
            fr["codes"][sb] = [
                (seed + 13 * gr + 31 * sb) % (n * n * n) for gr in range(12)
            ]
        else:
            fr["codes"][sb] = [
                tuple((seed + 13 * gr + 31 * sb + 17 * i) % n for i in range(3))
                for gr in range(12)
            ]
    return fr


def test_layer2_roundtrip_matches_spec_model():
    for seed in range(6):
        fr = _make_frame(seed)
        payload = encode_mp3_layer2([fr], kbps=192)
        got = decode_mp3_layer2(payload)
        want = _model_sprime(fr)
        assert got["n_frames"] == 1
        assert got["sample_rate"] == 44100
        assert got["n_active_subbands"] == len(fr["alloc"])
        assert got["n_samples"] == len(want)
        # sequential left-fold sum, exactly the decoder's accumulator
        rms = (sum(v * v for v in want) / len(want)) ** 0.5
        assert got["subband_rms"] == rms


def test_layer2_multiframe_concatenates():
    frs = [_make_frame(0), _make_frame(1), _make_frame(2)]
    got = decode_mp3_layer2(encode_mp3_layer2(frs, kbps=192))
    want = [v for s in range(3) for v in _model_sprime(_make_frame(s))]
    assert got["n_frames"] == 3
    assert got["n_samples"] == len(want)
    rms = (sum(v * v for v in want) / len(want)) ** 0.5
    assert got["subband_rms"] == rms


def test_layer2_requant_is_symmetric():
    """Quantizer outputs must be symmetric around 0 for every class —
    the property the closed-form C/D constants exist to guarantee."""
    for n, (nb, _, _) in _QCLASS.items():
        c = float(1 << nb) / n
        d = 1.0 - (n - 1) * 2.0 ** (-nb)
        vals = [c * (code * 2.0 ** (1 - nb) - 1.0 + d) for code in range(n)]
        assert vals == sorted(vals)
        for lo, hi in zip(vals, reversed(vals)):
            assert lo == pytest.approx(-hi, abs=1e-12)
        assert abs(vals[n // 2]) < 1e-12 or n % 2 == 0


def test_layer2_poison_contracts():
    fr = _make_frame(0)
    good = encode_mp3_layer2([fr], kbps=192)
    with pytest.raises(ValueError):
        decode_mp3_layer2(good[:30])  # truncated mid-frame -> no frames
    with pytest.raises(ValueError):
        decode_mp3_layer2(b"\x00" * 64)
    # a Layer III stream must be rejected, not misparsed
    with pytest.raises(ValueError):
        decode_mp3_layer2(encode_mp3_frames([128], sample_rate=44100))
    with pytest.raises(NotImplementedError):
        synthesize_mp3_pcm(good)


def test_layer2_census_rejects_layer2_stream():
    """And the Layer III census must reject Layer II (no silent cross-
    layer misparse in either direction)."""
    with pytest.raises(ValueError):
        parse_mp3(encode_mp3_layer2([_make_frame(0)], kbps=192))


def test_layer2_b2a_rows_are_complete():
    """Every B.2a row must carry exactly 2^nbal - 1 quant classes, and
    the sb 11-22 row is ISO table B.2a's SEVEN classes ending 31, 65535
    (NOT eight with a 63) — alloc index 7 there is the 16-bit class; a
    63-level 6-bit misread would desync every later field in the frame."""
    from audit_star_spark.analytics.mp3 import _B2A_STEPS

    for lo, hi, nbal, steps in _B2A_STEPS:
        assert len(steps) == (1 << nbal) - 1, (lo, hi)
    assert _b2a_row(11)[1] == (3, 5, 7, 9, 15, 31, 65535)
    assert _b2a_row(22)[1] == (3, 5, 7, 9, 15, 31, 65535)


def test_layer2_alloc7_sb12_is_16bit_class_hand_rolled_bitstream():
    """Decode a frame built BY HAND (no encoder involved — the encoder
    shares the table, so a roundtrip can't catch a table bug): mono
    192 kbps, only subband 12 active at alloc index 7, which per B.2a is
    the 65535-level ungrouped 16-bit class. A 63-level 6-bit misread
    would consume 216 sample bits instead of 576 and produce different
    values AND different n_samples accounting."""

    class BW:
        def __init__(self):
            self.bits = []

        def write(self, v, n):
            self.bits += [(v >> i) & 1 for i in range(n - 1, -1, -1)]

        def bytes_(self):
            out = bytearray()
            bits = self.bits + [0] * (-len(self.bits) % 8)
            for i in range(0, len(bits), 8):
                b = 0
                for bit in bits[i : i + 8]:
                    b = (b << 1) | bit
                out.append(b)
            return bytes(out)

    header = (
        (0x7FF << 21) | (0b11 << 19) | (0b10 << 17) | (1 << 16)
        | (10 << 12) | (0 << 10) | (0 << 9) | (0b11 << 6)
    )  # MPEG-1, Layer II, no CRC, 192 kbps, 44.1 kHz, mono
    bw = BW()
    bw.write(header, 32)
    for sb in range(SBLIMIT_B2A):  # allocation: only sb 12, index 7
        nbal, _ = _b2a_row(sb)
        bw.write(7 if sb == 12 else 0, nbal)
    bw.write(2, 2)  # scfsi=2: one scalefactor for all three parts
    bw.write(3, 6)  # sf index 3 -> factor 2^(1 - 3/3) = 1.0
    codes = [(7 * g) % 65535 for g in range(36)]  # 12 granules x 3
    for c in codes:
        bw.write(c, 16)
    body = bw.bytes_()
    size = (144 * 192 * 1000) // 44100
    payload = body + bytes(size - len(body))

    got = decode_mp3_layer2(payload)
    assert got["n_frames"] == 1
    assert got["channels"] == 1
    assert got["n_active_subbands"] == 1
    assert got["n_samples"] == 36
    # hand-computed s' = 1.0 * (2^16/65535) * (c*2^-15 - 1 + D),
    # D = 1 - 65534 * 2^-16  (the 16-bit ungrouped class constants)
    c_const = 65536.0 / 65535.0
    d_const = 1.0 - 65534.0 * 2.0 ** -16
    sum_sq = 0.0
    for c in codes:
        sp = c_const * (c * 2.0 ** -15 - 1.0 + d_const)
        sum_sq += sp * sp
    assert got["subband_rms"] == (sum_sq / 36) ** 0.5


# --------------------------------------------- Layer I subband decode
from audit_star_spark.analytics.mp3 import (  # noqa: E402
    decode_mp3_layer1,
    encode_mp3_layer1,
    SBLIMIT_L1,
)


def _l1_model_sprime(fr: dict) -> list[float]:
    out = []
    for gr in range(12):
        for sb in sorted(fr["alloc"]):
            a = fr["alloc"][sb]
            if not a:
                continue
            nb = a + 1
            n = (1 << nb) - 1
            code = fr["codes"][sb][gr]
            c_const = float(1 << nb) / n
            d_const = 1.0 - (n - 1) * 2.0 ** (-nb)
            factor = 2.0 ** (1.0 - fr["sf"][sb] / 3.0)
            out.append(
                factor * c_const * (code * 2.0 ** (1 - nb) - 1.0 + d_const)
            )
    return out


def _l1_frame(seed: int) -> dict:
    fr = {"alloc": {}, "sf": {}, "codes": {}}
    for sb in range(SBLIMIT_L1):
        if (sb + seed) % 4:
            continue
        a = 1 + ((sb + 3 * seed) % 14)
        n = (1 << (a + 1)) - 1
        fr["alloc"][sb] = a
        fr["sf"][sb] = (5 * sb + 7 * seed) % 63
        fr["codes"][sb] = [(seed + 11 * gr + 29 * sb) % n for gr in range(12)]
    return fr


def test_layer1_roundtrip_matches_spec_model():
    for seed in range(5):
        fr = _l1_frame(seed)
        got = decode_mp3_layer1(encode_mp3_layer1([fr], kbps=448))
        want = _l1_model_sprime(fr)
        assert got["n_frames"] == 1
        assert got["n_active_subbands"] == len(fr["alloc"])
        assert got["n_samples"] == len(want)
        rms = (sum(v * v for v in want) / len(want)) ** 0.5
        assert got["subband_rms"] == rms


def test_layer1_rejects_other_layers_and_truncation():
    fr = _l1_frame(0)
    good = encode_mp3_layer1([fr], kbps=448)
    with pytest.raises(ValueError):
        decode_mp3_layer1(good[:20])
    with pytest.raises(ValueError):
        decode_mp3_layer1(encode_mp3_layer2([_make_frame(0)], kbps=192))
    with pytest.raises(ValueError):
        decode_mp3_layer2(good)  # and the converse


def _make_stereo_frame(seed: int) -> dict:
    """Two channels with DIFFERENT allocations/scalefactors/codes per
    subband — any cross-channel bit slip scrambles the rms."""
    fr = {"alloc": {}, "scfsi": {}, "sf": {}, "codes": {}}
    for sb in range(SBLIMIT_B2A):
        if (sb + seed) % 3:
            continue
        _, steps = _b2a_row(sb)
        for ch in range(2):
            idx = 1 + ((sb + seed + 2 * ch) % (3 if sb < 23 else 2))
            n = steps[idx - 1]
            if n == 65535:
                idx, n = 1, steps[0]
            _, grouped, _ = _QCLASS[n]
            scfsi = (sb + seed + ch) % 4
            count = {0: 3, 1: 2, 2: 1, 3: 2}[scfsi]
            k = (ch, sb)
            fr["alloc"][k] = idx
            fr["scfsi"][k] = scfsi
            fr["sf"][k] = [
                (2 * sb + 3 * seed + 5 * ch + 11 * j) % 63 for j in range(count)
            ]
            if grouped:
                fr["codes"][k] = [
                    (seed + 13 * gr + 31 * sb + 7 * ch) % (n * n * n)
                    for gr in range(12)
                ]
            else:
                fr["codes"][k] = [
                    tuple(
                        (seed + 13 * gr + 31 * sb + 7 * ch + 17 * i) % n
                        for i in range(3)
                    )
                    for gr in range(12)
                ]
    return fr


def _stereo_model_sprime(fr: dict) -> list[float]:
    out = []
    for gr in range(12):
        part = gr // 4
        for sb in range(SBLIMIT_B2A):
            for ch in range(2):
                k = (ch, sb)
                if k not in fr["alloc"]:
                    continue
                _, steps = _b2a_row(sb)
                n = steps[fr["alloc"][k] - 1]
                nb, grouped, _ = _QCLASS[n]
                scfsi, sfs = fr["scfsi"][k], fr["sf"][k]
                parts = {
                    0: lambda s: (s[0], s[1], s[2]),
                    1: lambda s: (s[0], s[0], s[1]),
                    2: lambda s: (s[0], s[0], s[0]),
                    3: lambda s: (s[0], s[1], s[1]),
                }[scfsi](sfs)
                entry = fr["codes"][k][gr]
                codes = (
                    (entry % n, (entry // n) % n, (entry // (n * n)) % n)
                    if grouped
                    else tuple(entry)
                )
                c_const = float(1 << nb) / n
                d_const = 1.0 - (n - 1) * 2.0 ** (-nb)
                factor = 2.0 ** (1.0 - parts[part] / 3.0)
                for code in codes:
                    out.append(
                        factor * c_const
                        * (code * 2.0 ** (1 - nb) - 1.0 + d_const)
                    )
    return out


def test_layer2_stereo_roundtrip_matches_spec_model():
    for seed in range(4):
        fr = _make_stereo_frame(seed)
        payload = encode_mp3_layer2([fr], kbps=256, channels=2)
        got = decode_mp3_layer2(payload)
        want = _stereo_model_sprime(fr)
        assert got["channels"] == 2
        assert got["n_active_subbands"] == len(fr["alloc"])
        assert got["n_samples"] == len(want)
        rms = (sum(v * v for v in want) / len(want)) ** 0.5
        assert got["subband_rms"] == rms


def test_layer2_mono_still_bit_identical():
    """The stereo generalization must not move a single mono bit."""
    fr = _make_frame(0)
    assert encode_mp3_layer2([fr], kbps=192) == encode_mp3_layer2(
        [fr], kbps=192, channels=1
    )
    got = decode_mp3_layer2(encode_mp3_layer2([fr], kbps=192))
    assert got["channels"] == 1
    want = _model_sprime(fr)
    assert got["subband_rms"] == (sum(v * v for v in want) / len(want)) ** 0.5


def test_layer2_rejects_low_per_channel_rate():
    fr = _make_stereo_frame(0)
    # 96 kbps stereo = 48 kbps/ch -> outside B.2a
    with pytest.raises(ValueError, match="B.2a"):
        decode_mp3_layer2(encode_mp3_layer2([fr], kbps=96, channels=2))


def _make_intensity_frame(seed: int, bound: int) -> dict:
    """Below bound: per-channel stereo fields; at/above bound: ONE
    allocation + codes (keyed (0, sb)) with per-channel scalefactors."""
    fr = {"alloc": {}, "scfsi": {}, "sf": {}, "codes": {}}
    for sb in range(SBLIMIT_B2A):
        if (sb + seed) % 3:
            continue
        _, steps = _b2a_row(sb)
        idx = 1 + ((sb + seed) % (3 if sb < 23 else 2))
        n = steps[idx - 1]
        if n == 65535:
            idx, n = 1, steps[0]
        _, grouped, _ = _QCLASS[n]
        readers = range(2) if sb < bound else (0,)
        for ch in readers:
            k = (ch, sb)
            fr["alloc"][k] = idx
            if grouped:
                fr["codes"][k] = [
                    (seed + 13 * gr + 31 * sb + 7 * ch) % (n * n * n)
                    for gr in range(12)
                ]
            else:
                fr["codes"][k] = [
                    tuple(
                        (seed + 13 * gr + 31 * sb + 7 * ch + 17 * i) % n
                        for i in range(3)
                    )
                    for gr in range(12)
                ]
        for ch in range(2):  # scfsi/sf always per channel
            k = (ch, sb)
            scfsi = (sb + seed + ch) % 4
            fr["scfsi"][k] = scfsi
            fr["sf"][k] = [
                (2 * sb + 3 * seed + 5 * ch + 11 * j) % 63
                for j in range({0: 3, 1: 2, 2: 1, 3: 2}[scfsi])
            ]
    return fr


def test_layer2_intensity_stereo_roundtrip():
    """Intensity subbands: shared codes requantized once per channel
    with that channel's own scalefactor."""
    for bound in (4, 12):
        fr = _make_intensity_frame(1, bound)
        payload = encode_mp3_layer2(
            [fr], kbps=256, channels=2, joint_bound=bound
        )
        got = decode_mp3_layer2(payload)
        want = []
        for gr in range(12):
            part = gr // 4
            for sb in range(SBLIMIT_B2A):
                shared = sb >= bound
                for ch in (0,) if shared else range(2):
                    k = (ch, sb)
                    if k not in fr["alloc"]:
                        continue
                    _, steps = _b2a_row(sb)
                    n = steps[fr["alloc"][k] - 1]
                    nb, grouped, _ = _QCLASS[n]
                    entry = fr["codes"][k][gr]
                    codes = (
                        (entry % n, (entry // n) % n, (entry // (n * n)) % n)
                        if grouped
                        else tuple(entry)
                    )
                    c = float(1 << nb) / n
                    d = 1.0 - (n - 1) * 2.0 ** (-nb)
                    for tch in (0, 1) if shared else (ch,):
                        scfsi, sfs = fr["scfsi"][(tch, sb)], fr["sf"][(tch, sb)]
                        parts = {
                            0: lambda s: (s[0], s[1], s[2]),
                            1: lambda s: (s[0], s[0], s[1]),
                            2: lambda s: (s[0], s[0], s[0]),
                            3: lambda s: (s[0], s[1], s[1]),
                        }[scfsi](sfs)
                        f = 2.0 ** (1.0 - parts[part] / 3.0)
                        for code in codes:
                            want.append(
                                f * c * (code * 2.0 ** (1 - nb) - 1.0 + d)
                            )
        assert got["channels"] == 2
        assert got["n_samples"] == len(want)
        rms = (sum(v * v for v in want) / len(want)) ** 0.5
        assert got["subband_rms"] == rms, bound


def test_audio_meta_mp2_full_decode_through_spark(spark):
    """audio_meta dispatches Layer II to the FULL subband decode (rms
    populated from the requantized samples), Layer III to the header
    census (rms NULL), with both magics distinguished correctly."""
    from audit_star_spark.analytics.multimodal import audio_meta

    fr = _make_frame(1)
    rows = [
        (1, bytearray(encode_mp3_layer2([fr, fr], kbps=192))),
        (2, bytearray(encode_mp3_frames([128] * 4, sample_rate=44100))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_meta(df).collect()}
    assert got[1]["format"] == "mp2"
    assert got[1]["n_channels"] == 1
    assert got[1]["n_samples"] == 2 * SAMPLES_PER_FRAME
    want = _model_sprime(fr) * 2
    rms = (sum(v * v for v in want) / len(want)) ** 0.5
    assert got[1]["rms"] == pytest.approx(rms, rel=1e-12)
    assert got[1]["zero_crossings"] is None
    assert got[2]["format"] == "mp3" and got[2]["rms"] is None


def test_layer1_stereo_roundtrip():
    fr = {"alloc": {}, "sf": {}, "codes": {}}
    want = []
    for sb in range(0, SBLIMIT_L1, 5):
        for ch in range(2):
            a = 1 + ((sb + 5 * ch) % 14)
            n = (1 << (a + 1)) - 1
            fr["alloc"][(ch, sb)] = a
            fr["sf"][(ch, sb)] = (3 * sb + 7 * ch) % 63
            fr["codes"][(ch, sb)] = [(sb + 11 * gr + ch) % n for gr in range(12)]
    for gr in range(12):
        for sb in range(0, SBLIMIT_L1, 5):
            for ch in range(2):
                a = fr["alloc"][(ch, sb)]
                nb = a + 1
                n = (1 << nb) - 1
                code = fr["codes"][(ch, sb)][gr]
                c = float(1 << nb) / n
                d = 1.0 - (n - 1) * 2.0 ** (-nb)
                f = 2.0 ** (1.0 - fr["sf"][(ch, sb)] / 3.0)
                want.append(f * c * (code * 2.0 ** (1 - nb) - 1.0 + d))
    got = decode_mp3_layer1(encode_mp3_layer1([fr], kbps=448, channels=2))
    assert got["channels"] == 2
    assert got["n_active_subbands"] == len(fr["alloc"])
    assert got["n_samples"] == len(want)
    assert got["subband_rms"] == (sum(v * v for v in want) / len(want)) ** 0.5


def test_layer1_mono_still_bit_identical():
    fr = _l1_frame(2)
    assert encode_mp3_layer1([fr], kbps=448) == encode_mp3_layer1(
        [fr], kbps=448, channels=1
    )
    got = decode_mp3_layer1(encode_mp3_layer1([fr], kbps=448))
    assert got["channels"] == 1


def test_layer1_intensity_stereo_roundtrip():
    bound = 8
    fr = {"alloc": {}, "sf": {}, "codes": {}}
    want = []
    for sb in range(0, SBLIMIT_L1, 4):
        readers = range(2) if sb < bound else (0,)
        a = 1 + (sb % 14)
        n = (1 << (a + 1)) - 1
        for ch in readers:
            fr["alloc"][(ch, sb)] = a
            fr["codes"][(ch, sb)] = [(sb + 11 * gr + ch) % n for gr in range(12)]
        for ch in range(2):
            fr["sf"][(ch, sb)] = (3 * sb + 7 * ch) % 63
    for gr in range(12):
        for sb in range(0, SBLIMIT_L1, 4):
            shared = sb >= bound
            a = fr["alloc"][(0, sb)]
            nb = a + 1
            n = (1 << nb) - 1
            for ch in (0,) if shared else range(2):
                code = fr["codes"][(ch, sb)][gr]
                c = float(1 << nb) / n
                d = 1.0 - (n - 1) * 2.0 ** (-nb)
                s3 = code * 2.0 ** (1 - nb) - 1.0
                for tch in (0, 1) if shared else (ch,):
                    f = 2.0 ** (1.0 - fr["sf"][(tch, sb)] / 3.0)
                    want.append(f * c * (s3 + d))
    got = decode_mp3_layer1(
        encode_mp3_layer1([fr], kbps=448, channels=2, joint_bound=bound)
    )
    assert got["channels"] == 2
    assert got["n_samples"] == len(want)
    assert got["subband_rms"] == (sum(v * v for v in want) / len(want)) ** 0.5


# --------------------------------------- Layer III side information
from audit_star_spark.analytics.mp3 import (  # noqa: E402
    decode_mp3_layer3_samples,
    decode_mp3_layer3_sideinfo,
    encode_mp3_layer3_sideinfo,
)


def _l3_granule(seed: int, ws: bool) -> dict:
    g = {
        "part2_3_length": (seed * 97) % 4096,
        "big_values": (seed * 31) % 289,
        "global_gain": (seed * 7) % 256,
        "scalefac_compress": seed % 16,
        "window_switching": int(ws),
        "preflag": seed % 2,
        "scalefac_scale": (seed // 2) % 2,
        "count1table_select": (seed // 4) % 2,
    }
    if ws:
        g["block_type"] = 1 + seed % 3
        g["mixed_block"] = (seed // 3) % 2
        g["table_select"] = [(seed + i) % 32 for i in range(2)]
        g["subblock_gain"] = [(seed + i) % 8 for i in range(3)]
    else:
        g["block_type"] = 0
        g["mixed_block"] = 0
        g["table_select"] = [(seed + i) % 32 for i in range(3)]
        g["region0_count"] = seed % 16
        g["region1_count"] = (seed + 1) % 8
    return g


def _l3_frame(seed: int, channels: int = 1) -> dict:
    return {
        "main_data_begin": (seed * 11) % 512,
        "scfsi": [(seed + ch) % 16 for ch in range(channels)],
        "granules": [
            [_l3_granule(seed + 10 * gr + ch, ws=(seed + gr) % 3 == 0)
             for ch in range(channels)]
            for gr in range(2)
        ],
    }


def test_layer3_sideinfo_roundtrip_mono_and_stereo():
    for channels in (1, 2):
        frames = [_l3_frame(s, channels) for s in range(4)]
        payload = encode_mp3_layer3_sideinfo(
            frames, kbps=128, channels=channels
        )
        got = decode_mp3_layer3_sideinfo(payload)
        assert got["n_frames"] == 4
        assert got["channels"] == channels
        assert got["n_granules"] == 4 * 2 * channels
        assert got["max_main_data_begin"] == max(
            (s * 11) % 512 for s in range(4)
        )
        # every transmitted field reads back exactly
        by_key = {
            (g["frame"], g["gr"], g["ch"]): g for g in got["granules"]
        }
        for fi, fr in enumerate(frames):
            for gr in range(2):
                for ch in range(channels):
                    want = fr["granules"][gr][ch]
                    g = by_key[fi, gr, ch]
                    for k, v in want.items():
                        assert g[k] == v, (fi, gr, ch, k)


def test_layer3_sideinfo_hand_rolled_bitstream():
    """Decode a frame built BY HAND (no encoder): mono 64 kbps, both
    granules long blocks with known field values — catches any layout
    disagreement the encode/decode pair could share."""

    class BW:
        def __init__(self):
            self.bits = []

        def write(self, v, n):
            self.bits += [(v >> i) & 1 for i in range(n - 1, -1, -1)]

        def bytes_(self):
            out, bits = bytearray(), self.bits + [0] * (-len(self.bits) % 8)
            for i in range(0, len(bits), 8):
                b = 0
                for bit in bits[i : i + 8]:
                    b = (b << 1) | bit
                out.append(b)
            return bytes(out)

    header = (
        (0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16)
        | (5 << 12) | (0 << 10) | (0 << 9) | (0b11 << 6)
    )  # MPEG-1, Layer III, no CRC, 64 kbps, 44.1 kHz, mono
    bw = BW()
    bw.write(header, 32)
    bw.write(300, 9)   # main_data_begin
    bw.write(0, 5)     # private
    bw.write(0b1010, 4)  # scfsi: bands 0 and 2 reused in granule 1
    for gr, (p23, bv, gg, sc) in enumerate(
        [(1234, 250, 200, 5), (2345, 100, 150, 14)]
    ):
        bw.write(p23, 12)
        bw.write(bv, 9)
        bw.write(gg, 8)
        bw.write(sc, 4)
        bw.write(0, 1)  # no window switching
        for t in (3, 17, 30):
            bw.write(t, 5)
        bw.write(9, 4)  # region0
        bw.write(5, 3)  # region1
        bw.write(1, 1)  # preflag
        bw.write(0, 1)  # scalefac_scale
        bw.write(1, 1)  # count1table_select
    body = bw.bytes_()
    size = (144 * 64 * 1000) // 44100
    got = decode_mp3_layer3_sideinfo(body + bytes(size - len(body)))
    assert got["n_frames"] == 1 and got["channels"] == 1
    assert got["sum_part2_3"] == 1234 + 2345
    assert got["sum_big_values"] == 350
    assert got["sum_global_gain"] == 350
    assert got["max_main_data_begin"] == 300
    assert got["n_reservoir_frames"] == 1
    g0, g1 = got["granules"]
    assert g0["table_select"] == [3, 17, 30]
    assert g0["region0_count"] == 9 and g0["region1_count"] == 5
    # scf bits: sc=5 -> slen (1,1): gr0 = 11 + 10 = 21;
    # sc=14 -> (4,2): gr1 with scfsi 1010 skips bands 0 (6*s1) and 2
    # (5*s2): (5*4) + (5*2) = 30
    assert g0["scf_bits"] == 21
    assert g1["scf_bits"] == 30
    assert got["sum_scf_bits"] == 51


def test_layer3_scf_bit_budgets_per_block_type():
    """§2.4.2.7 budgets: long 11*s1+10*s2, short 18/18, mixed 17/18;
    scfsi reuse applies only to granule-1 long blocks."""
    from audit_star_spark.analytics.mp3 import _scf_bits

    assert _scf_bits(0, 0, 0, 0, 0, 3, 2) == 11 * 3 + 10 * 2
    assert _scf_bits(1, 0b1111, 0, 0, 0, 3, 2) == 0  # all reused
    assert _scf_bits(1, 0b1111, 1, 2, 0, 3, 2) == 18 * 3 + 18 * 2  # short
    assert _scf_bits(0, 0, 1, 2, 1, 3, 2) == 17 * 3 + 18 * 2  # mixed
    assert _scf_bits(1, 0b1000, 0, 0, 0, 4, 1) == 5 * 4 + 5 * 1 + 5 * 1


def test_layer3_sideinfo_poison_contracts():
    frames = [_l3_frame(0)]
    good = encode_mp3_layer3_sideinfo(frames, kbps=64)
    with pytest.raises(ValueError):
        decode_mp3_layer3_sideinfo(b"\x00" * 64)  # no sync
    with pytest.raises(ValueError):  # Layer II stream must be rejected
        decode_mp3_layer3_sideinfo(
            encode_mp3_layer2([_make_frame(0)], kbps=192)
        )
    # big_values > 288 poison: patch the field in-place (bit 32+9+5+4+12)
    bad = bytearray(good)
    # big_values field starts at bit 62; set it to 511 (all ones)
    for bit in range(62, 71):
        bad[bit // 8] |= 0x80 >> (bit % 8)
    with pytest.raises(ValueError):
        decode_mp3_layer3_sideinfo(bytes(bad))
    # the honest sample-decode boundary names the blocking tables
    with pytest.raises(NotImplementedError) as ei:
        decode_mp3_layer3_samples(good)
    assert "B.7" in str(ei.value) and "B.8" in str(ei.value)


def test_layer3_block_type_zero_with_switching_rejected():
    fr = _l3_frame(0)
    fr["granules"][0][0]["window_switching"] = 1
    fr["granules"][0][0]["block_type"] = 0
    fr["granules"][0][0]["table_select"] = [1, 2]
    fr["granules"][0][0]["subblock_gain"] = [0, 0, 0]
    with pytest.raises(ValueError):
        encode_mp3_layer3_sideinfo([fr], kbps=64)
