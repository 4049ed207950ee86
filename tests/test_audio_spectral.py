"""Frequency-domain audio census (multimodal.audio_spectral_stats):
pure-tone bin concentration, Parseval energy check against the
time-domain signal, band split accounting, poison/validation
contracts."""

import numpy as np
import pytest


def _media(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def _wav(samples, rate=8000):
    from audit_star_spark.analytics.multimodal import encode_wav

    return bytearray(encode_wav(np.asarray(samples, dtype="<i2"), rate))


def test_pure_tone_lands_in_its_bin_band(spark):
    """A sinusoid at exactly bin k of the 64-point frame puts (almost)
    all its energy in that bin — centroid must sit at k and the band
    holding k must dominate."""
    from audit_star_spark.analytics.multimodal import audio_spectral_stats

    rows = []
    for doc_id, k in ((1, 4), (2, 16), (3, 28)):
        t = np.arange(256)
        s = np.round(20000 * np.sin(2 * np.pi * k * t / 64)).astype("<i2")
        rows.append((doc_id, _wav(s)))
    got = {
        r["doc_id"]: r
        for r in audio_spectral_stats(_media(spark, rows)).collect()
    }
    for doc_id, k in ((1, 4), (2, 16), (3, 28)):
        r = got[doc_id]
        assert r["n_frames"] == 4
        assert r["centroid"] == pytest.approx(k, abs=0.05)
        total = r["e_low"] + r["e_mid"] + r["e_high"]
        band = {4: "e_low", 16: "e_mid", 28: "e_high"}[k]
        assert r[band] / total > 0.95


def test_parseval_against_time_domain(spark):
    """Parseval for the real DFT: sum over ALL bins of |X[k]|^2 equals
    n * sum(w[t]^2 x[t]^2). The census keeps bins 1..n/2, so for a
    ZERO-MEAN signal whose spectrum avoids DC and Nyquist, band sums
    must equal n/2 * time-domain windowed energy (each rfft bin k in
    1..n/2-1 carries half the two-sided energy)."""
    from audit_star_spark.analytics.multimodal import audio_spectral_stats

    t = np.arange(64)
    x = 12000 * np.sin(2 * np.pi * 5 * t / 64) + 6000 * np.sin(
        2 * np.pi * 19 * t / 64
    )
    s = np.round(x).astype("<i2")
    got = audio_spectral_stats(_media(spark, [(1, _wav(s))])).collect()[0]
    win = 0.5 - 0.5 * np.cos(2 * np.pi * t / 64)
    xe = (win * (s.astype(np.float64) / 32768.0)) ** 2
    want = 64 * xe.sum() / 2  # one-sided bins carry half of Parseval
    total = got["e_low"] + got["e_mid"] + got["e_high"]
    assert total == pytest.approx(want, rel=1e-6)


def test_stereo_downmix_and_tail_drop(spark):
    from audit_star_spark.analytics.multimodal import (
        audio_spectral_stats,
        encode_wav,
    )

    t = np.arange(64 + 30)  # 30-sample tail must drop
    mono = np.round(10000 * np.sin(2 * np.pi * 8 * t / 64)).astype("<i2")
    stereo = np.empty(2 * len(mono), dtype="<i2")
    stereo[0::2] = mono
    stereo[1::2] = mono
    payload = bytearray(encode_wav(stereo, 8000, channels=2))
    got = audio_spectral_stats(_media(spark, [(1, payload)])).collect()[0]
    assert got["n_frames"] == 1
    assert got["centroid"] == pytest.approx(8, abs=0.05)


def test_poison_and_short_degrade_to_null(spark):
    from audit_star_spark.analytics.multimodal import audio_spectral_stats

    rows = [
        (1, bytearray(b"not a wav")),
        (2, _wav(np.zeros(10, dtype="<i2"))),  # shorter than one frame
    ]
    got = {
        r["doc_id"]: r
        for r in audio_spectral_stats(_media(spark, rows)).collect()
    }
    for d in (1, 2):
        assert got[d]["n_frames"] is None and got[d]["e_low"] is None


def test_frame_validation(spark):
    from audit_star_spark.analytics.multimodal import audio_spectral_stats

    m = _media(spark, [(1, _wav(np.zeros(64, dtype="<i2")))])
    for bad in (0, 7, 63, 100):
        with pytest.raises(ValueError):
            audio_spectral_stats(m, frame=bad)
