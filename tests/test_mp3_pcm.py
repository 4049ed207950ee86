"""Layer III PCM synthesis via the B.3 escape hatch
(analytics/mp3.py decode_mp3_layer3_pcm / synthesize_subband_pcm):
full encode -> PCM round trip under CLEARLY-SYNTHETIC tables, checked
against an independent numpy re-derivation of the published pipeline
(requantize -> alias butterflies -> IMDCT -> overlap-add -> frequency
inversion -> polyphase filterbank), built from the frame SPECS — it
never reads the decoder's intermediates. No ISO tabulated constant
appears anywhere; the honest no-tables raises stay locked."""

import math

import numpy as np
import pytest

from audit_star_spark.analytics.mp3 import (
    decode_mp3_layer3_pcm,
    encode_mp3_layer3_frames,
    synthesize_subband_pcm,
    synthetic_l3_tables,
)

# clearly-synthetic stand-ins for the tabulated constants
SYNTH_WINDOW = [math.sin(0.013 * i) * math.exp(-i / 400.0) for i in range(512)]
ALIAS_CI = [-0.6 + 0.07 * i for i in range(8)]
SFB_SHORT = [16 * i for i in range(13)]  # even 12-band split of 0..192
PRETAB = [i % 3 for i in range(21)]


def _pcm_tables(**over):
    t = synthetic_l3_tables(max_val=2)
    t.update(
        synth_window=SYNTH_WINDOW,
        alias_ci=ALIAS_CI,
        sfb_short=SFB_SHORT,
        pretab=PRETAB,
        **over,
    )
    return t


def _long_gran(seed, preflag=0, scalefac_scale=0, block_type=0):
    pairs = [
        ((seed + i) % 3 - 1, (seed + 2 * i + 1) % 3 - 1) for i in range(8)
    ]
    g = {
        "global_gain": 200 + seed % 20,
        "scalefac_compress": 9,
        "window_switching": 1 if block_type in (1, 3) else 0,
        "block_type": block_type,
        "mixed_block": 0,
        "table_select": [1, 1] if block_type in (1, 3) else [1, 1, 1],
        "region0_count": None if block_type in (1, 3) else 4,
        "region1_count": None if block_type in (1, 3) else 5,
        "preflag": preflag,
        "scalefac_scale": scalefac_scale,
        "count1table_select": 0,
        "scalefacs": [(seed + j) % 4 for j in range(21)],
        "pairs": pairs,
        "quads": [(1, 0, -1, 0), (0, 1, 0, -1)],
    }
    if block_type in (1, 3):
        g["subblock_gain"] = [0, 0, 0]
    return g


def _short_gran(seed):
    return {
        "global_gain": 205 + seed % 9,
        "scalefac_compress": 9,
        "window_switching": 1,
        "block_type": 2,
        "mixed_block": 0,
        "table_select": [1, 1],
        "subblock_gain": [(seed + w) % 4 for w in range(3)],
        "region0_count": None,
        "region1_count": None,
        "preflag": 0,
        "scalefac_scale": 1,
        "count1table_select": 0,
        "scalefacs": [(seed + j) % 4 for j in range(36)],
        "pairs": [((seed + i) % 3 - 1, (seed + i) % 2) for i in range(10)],
        "quads": [(0, -1, 1, 0)],
    }


# -------------------------------------------------- independent oracle
def _np_coded_samples(g):
    out = []
    for x, y in g["pairs"]:
        out.extend((x, y))
    for q in g["quads"]:
        out.extend(q)
    return np.array(out + [0] * (576 - len(out)), dtype=float)


def _np_requant(g, sfb_long):
    s = _np_coded_samples(g)
    mult = 1.0 if g["scalefac_scale"] else 0.5
    xr = np.zeros(576)
    if g.get("block_type") == 2:
        sbg = g["subblock_gain"]
        cidx = 0
        for n in range(12):
            start, end = SFB_SHORT[n], SFB_SHORT[n + 1]
            for w in range(3):
                gain = 2.0 ** (0.25 * (g["global_gain"] - 210 - 8 * sbg[w]))
                scale = gain * 2.0 ** (-mult * g["scalefacs"][n * 3 + w])
                for f in range(start, end):
                    v = s[cidx]
                    cidx += 1
                    xr[18 * (f // 6) + 6 * w + (f % 6)] = (
                        np.sign(v) * abs(v) ** (4.0 / 3.0) * scale
                    )
        return xr
    gain = 2.0 ** (0.25 * (g["global_gain"] - 210))
    bands = np.searchsorted(np.array(sfb_long[1:-1]), np.arange(576), "right")
    for i in range(576):
        b = bands[i]
        sf = g["scalefacs"][b] if b < 21 else 0
        pre = PRETAB[b] if (g["preflag"] and b < 21) else 0
        xr[i] = (
            np.sign(s[i])
            * abs(s[i]) ** (4.0 / 3.0)
            * gain
            * 2.0 ** (-mult * (sf + pre))
        )
    return xr


def _np_imdct_mat(n):
    half = n // 2
    i = np.arange(n)[:, None]
    k = np.arange(half)[None, :]
    return np.cos(np.pi / (2 * n) * (2 * i + 1 + half) * (2 * k + 1))


def _np_block_window(bt):
    if bt == 2:
        return np.sin(np.pi / 12 * (np.arange(12) + 0.5))
    w = np.sin(np.pi / 36 * (np.arange(36) + 0.5))
    if bt == 1:
        w[18:24] = 1.0
        w[24:30] = np.sin(np.pi / 12 * (np.arange(24, 30) - 18 + 0.5))
        w[30:] = 0.0
    elif bt == 3:
        w[:6] = 0.0
        w[6:12] = np.sin(np.pi / 12 * (np.arange(6, 12) - 6 + 0.5))
        w[12:18] = 1.0
    return w


def _np_granule_to_blocks(xr, bt, overlap):
    """(18, 32) time x subband matrix + updated overlap state."""
    ci = np.array(ALIAS_CI)
    cs = 1.0 / np.sqrt(1.0 + ci**2)
    ca = ci / np.sqrt(1.0 + ci**2)
    xr = xr.copy()
    if bt != 2:
        for sb in range(1, 32):
            for i in range(8):
                a, b = xr[18 * sb - 1 - i], xr[18 * sb + i]
                xr[18 * sb - 1 - i] = a * cs[i] - b * ca[i]
                xr[18 * sb + i] = b * cs[i] + a * ca[i]
    out = np.zeros((18, 32))
    for sb in range(32):
        if bt == 2:
            y = np.zeros(36)
            m12, w12 = _np_imdct_mat(12), _np_block_window(2)
            for w in range(3):
                xw = m12 @ xr[18 * sb + 6 * w: 18 * sb + 6 * w + 6]
                y[6 + 6 * w: 18 + 6 * w] += xw * w12
        else:
            y = (_np_imdct_mat(36) @ xr[18 * sb: 18 * sb + 18]) * (
                _np_block_window(bt)
            )
        cur = y[:18] + overlap[sb]
        overlap[sb] = y[18:]
        if sb % 2:
            cur[1::2] = -cur[1::2]
        out[:, sb] = cur
    return out


def _np_filterbank(blocks, window):
    n_mat = np.cos(
        (16 + np.arange(64))[:, None]
        * (2 * np.arange(32) + 1)[None, :]
        * np.pi
        / 64
    )
    v = np.zeros(1024)
    w_arr = np.asarray(window)
    out = []
    for s in blocks:
        v = np.concatenate([n_mat @ np.asarray(s, float), v[:960]])
        u = np.zeros(512)
        for i in range(8):
            u[i * 64: i * 64 + 32] = v[i * 128: i * 128 + 32]
            u[i * 64 + 32: i * 64 + 64] = v[i * 128 + 96: i * 128 + 128]
        w = u * w_arr
        out.append(w.reshape(16, 32).sum(axis=0))
    return np.concatenate(out)


def _np_pcm(frames, tables):
    overlap = np.zeros((32, 18))
    blocks = []
    for fr in frames:
        for gr in range(2):
            g = fr["granules"][gr][0]
            # granule-1 scfsi reuse: replay granule 0's groups
            sf = list(g["scalefacs"])
            if gr == 1 and g.get("block_type") != 2:
                scfsi = fr["scfsi"][0]
                g0 = fr["granules"][0][0]["scalefacs"]
                for b, (lo, hi) in enumerate(
                    ((0, 6), (6, 11), (11, 16), (16, 21))
                ):
                    if (scfsi >> (3 - b)) & 1:
                        sf[lo:hi] = g0[lo:hi]
            xr = _np_requant({**g, "scalefacs": sf}, tables["sfb_long"])
            mat = _np_granule_to_blocks(xr, g.get("block_type", 0), overlap)
            blocks.extend(mat[t] for t in range(18))
    return _np_filterbank(blocks, tables["synth_window"])


# -------------------------------------------------------------- tests
def test_no_tables_raises_naming_b3():
    with pytest.raises(NotImplementedError, match="B.3"):
        decode_mp3_layer3_pcm(b"\x00")
    with pytest.raises(NotImplementedError, match="synth_window"):
        decode_mp3_layer3_pcm(b"\x00", synthetic_l3_tables())


def test_filterbank_matches_numpy():
    blocks = [
        [math.sin(0.1 * (32 * t + k)) for k in range(32)] for t in range(7)
    ]
    got = synthesize_subband_pcm(blocks, SYNTH_WINDOW)
    want = _np_filterbank(blocks, SYNTH_WINDOW)
    assert len(got) == 7 * 32
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_filterbank_validates_window_shape():
    with pytest.raises(ValueError, match="512"):
        synthesize_subband_pcm([[0.0] * 32], [1.0] * 100)


def test_pcm_roundtrip_long_blocks_matches_numpy_oracle():
    tables = _pcm_tables()
    frames = [
        {
            "scfsi": [0b1010],
            "granules": [
                [_long_gran(3, preflag=1)],
                [_long_gran(7, scalefac_scale=1)],
            ],
        },
        {
            "scfsi": [0b0000],
            "granules": [
                [_long_gran(11, block_type=1)],
                [_long_gran(4, block_type=3)],
            ],
        },
    ]
    payload = encode_mp3_layer3_frames(frames, tables)
    r = decode_mp3_layer3_pcm(payload, tables)
    assert r["n_frames"] == 2 and r["channels"] == 1
    assert len(r["pcm"][0]) == r["n_granules"] * 576 == 4 * 576
    np.testing.assert_allclose(
        r["pcm"][0], _np_pcm(frames, tables), rtol=0, atol=1e-9
    )
    assert max(abs(x) for x in r["pcm"][0]) > 0  # signal actually flows


def test_pcm_roundtrip_short_blocks_matches_numpy_oracle():
    tables = _pcm_tables()
    frames = [
        {
            "scfsi": [0b0000],
            "granules": [[_short_gran(5)], [_short_gran(8)]],
        }
    ]
    payload = encode_mp3_layer3_frames(frames, tables)
    r = decode_mp3_layer3_pcm(payload, tables)
    assert len(r["pcm"][0]) == 2 * 576
    np.testing.assert_allclose(
        r["pcm"][0], _np_pcm(frames, tables), rtol=0, atol=1e-9
    )


def test_short_blocks_without_sfb_short_raise():
    tables = _pcm_tables()
    payload = encode_mp3_layer3_frames(
        [{"scfsi": [0b0000], "granules": [[_short_gran(5)], [_short_gran(8)]]}],
        tables,
    )
    stripped = {k: v for k, v in tables.items() if k != "sfb_short"}
    with pytest.raises(NotImplementedError, match="sfb_short"):
        decode_mp3_layer3_pcm(payload, stripped)


def test_preflag_without_pretab_raises():
    tables = _pcm_tables()
    payload = encode_mp3_layer3_frames(
        [
            {
                "scfsi": [0b0000],
                "granules": [[_long_gran(3, preflag=1)], [_long_gran(7)]],
            }
        ],
        tables,
    )
    stripped = {k: v for k, v in tables.items() if k != "pretab"}
    with pytest.raises(NotImplementedError, match="pretab"):
        decode_mp3_layer3_pcm(payload, stripped)
