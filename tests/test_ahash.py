"""Perceptual average-hash: invariance to rescale, sensitivity in bits to
pixel flips, near-pair blocking, and the poison-payload degrade path."""

import numpy as np

from audit_star_spark.analytics.multimodal import (
    ahash_near_pairs,
    encode_netpbm,
    image_ahash,
)


def _base_img(h=32, w=32):
    # left half dark, right half bright: ahash = rows of 0000 1111
    img = np.zeros((h, w, 1), dtype=np.uint8)
    img[:, w // 2 :, 0] = 200
    return img


def _media(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )


def test_ahash_known_pattern_and_rescale_invariance(spark):
    big = encode_netpbm(_base_img(64, 64))
    small = encode_netpbm(_base_img(8, 8))
    rows = {r["doc_id"]: r for r in image_ahash(_media(spark, [big, small])).collect()}
    # half-dark/half-bright rows -> every row hashes to 0f
    assert rows[0]["ahash"] == "0f" * 8
    # nearest-neighbor downsample preserves the structure exactly
    assert rows[0]["ahash"] == rows[1]["ahash"]
    assert rows[0]["ahash_bits"] == rows[1]["ahash_bits"]


def test_ahash_near_pairs_blocks_and_filters(spark):
    base = _base_img(16, 16)
    near = base.copy()
    # flip a DARK cell the 16->8 nearest-neighbor grid actually samples
    # (even indices only): bottom-left corner cell -> hamming 1
    near[14, 0, 0] = 200
    far = np.transpose(base, (1, 0, 2)).copy()  # top/bottom split instead
    payloads = [encode_netpbm(x) for x in (base, near, far)]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in ahash_near_pairs(_media(spark, payloads), max_hamming=2).collect()
    }
    assert pairs == {(0, 1): 1}  # far image: different prefix/hamming


def test_ahash_poison_payload_degrades(spark):
    good = encode_netpbm(_base_img(8, 8))
    rows = {
        r["doc_id"]: r
        for r in image_ahash(_media(spark, [good, b"\x00garbage"])).collect()
    }
    assert rows[0]["ahash"] is not None
    assert rows[1]["ahash"] is None and rows[1]["ahash_bits"] is None
    # degraded rows never reach the pair join
    assert (
        ahash_near_pairs(_media(spark, [good, b"\x00junk"]), max_hamming=63).count()
        == 0
    )


def test_audio_fingerprint_contour_and_degrade(spark):
    from audit_star_spark.analytics.multimodal import (
        audio_fingerprint,
        encode_wav,
    )

    # 64 windows x 10 samples: loud (A=1000) on even windows, quiet
    # (A=10) on odd -> bits alternate 1010... -> hex "aaaa..."
    amps = np.array([1000 if w % 2 == 0 else 10 for w in range(64)])
    sign = np.array([1, -1] * 5)
    s = (amps[:, None] * sign[None, :]).reshape(-1).astype("<i2")
    wav = encode_wav(s, 16000)
    # same contour at double amplitude -> identical bits (scale-free)
    wav2 = encode_wav((2 * s.astype(np.int32)).astype("<i2"), 16000)
    short = encode_wav(np.array([1] * 10, dtype="<i2"), 16000)  # < 64 samples
    rows = {
        r["doc_id"]: r
        for r in audio_fingerprint(
            _media(spark, [wav, wav2, short, b"RIFFjunk"])
        ).collect()
    }
    assert rows[0]["afp"] == "a" * 16
    assert rows[1]["afp"] == rows[0]["afp"]
    assert rows[2]["afp"] is None  # too short: degrade, not crash
    assert rows[3]["afp"] is None  # undecodable: degrade
