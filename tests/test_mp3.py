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
