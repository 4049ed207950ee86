"""DCT perceptual hash: fixed-point basis integrity, contrast-scale
invariance, frequency-domain robustness vs the average hash, exact-recall
near-pair blocking, and the poison-payload degrade path."""

import numpy as np

from audit_star_spark.analytics.multimodal import (
    PHASH_BASIS,
    PHASH_INPUT,
    PHASH_Q,
    PHASH_SIZE,
    _phash_of,
    encode_netpbm,
    image_phash,
    phash_near_pairs,
)


def _media(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )


def _grad_img(h=32, w=32):
    # smooth 2-D gradient: rich low-frequency content for the DCT block
    y, x = np.mgrid[0:h, 0:w]
    img = ((x * 100) // w + (y * 80) // h).astype(np.uint8)
    return img[..., None]


def test_phash_basis_is_the_q10_cosine_table():
    import math

    assert len(PHASH_BASIS) == PHASH_SIZE
    assert all(len(r) == PHASH_INPUT for r in PHASH_BASIS)
    assert PHASH_BASIS[0] == [PHASH_Q] * PHASH_INPUT  # DC row
    for u in (1, 3, 7):
        for x in (0, 5, 31):
            want = round(
                math.cos(math.pi * (2 * x + 1) * u / (2 * PHASH_INPUT)) * PHASH_Q
            )
            assert PHASH_BASIS[u][x] == want
    # every coefficient stays int64-exact: |pass1| < 2^23, |coef| < 2^38
    assert max(abs(v) for r in PHASH_BASIS for v in r) <= PHASH_Q


def test_phash_contrast_scale_invariance():
    """Doubling contrast scales every DCT coefficient positively, so the
    median threshold — and the hash — cannot move (the frequency-domain
    property the spatial average hash lacks for structured scenes)."""
    img = (_grad_img() // 2).astype(np.uint8)  # values <= 89, safe to double
    hx1, b1 = _phash_of(img)
    hx2, b2 = _phash_of((img.astype(np.int64) * 2).astype(np.uint8))
    assert hx1 == hx2 and b1 == b2
    assert len(hx1) == 16


def test_phash_brightness_robust_structure_sensitive():
    img = _grad_img()
    _, base_bits = _phash_of(img)
    # +20 brightness moves ONLY the DC coefficient: at most 1 bit flips
    bright = np.clip(img.astype(np.int64) + 20, 0, 255).astype(np.uint8)
    _, bright_bits = _phash_of(bright)
    assert bin(base_bits ^ bright_bits).count("1") <= 1
    # unrelated content (independent noise fields) lands far away: the
    # median split fixes 32 one-bits per hash, so two unrelated hashes
    # sit ~32 bits apart — far above any near-dup threshold
    rng = np.random.RandomState(3)
    _, n1 = _phash_of(rng.randint(0, 256, (32, 32, 1)).astype(np.uint8))
    _, n2 = _phash_of(rng.randint(0, 256, (32, 32, 1)).astype(np.uint8))
    assert bin((n1 ^ n2) & (2**64 - 1)).count("1") >= 16


def test_phash_rescale_invariance_and_rgb_gray(spark):
    big = encode_netpbm(_grad_img(64, 64))
    small = encode_netpbm(_grad_img(32, 32))
    rows = {
        r["doc_id"]: r for r in image_phash(_media(spark, [big, small])).collect()
    }
    # the 64->32 nearest-neighbor grid samples the SAME gradient values
    assert rows[0]["phash"] == rows[1]["phash"]
    # an RGB image whose channels all equal the gray plane hashes alike
    g = _grad_img()
    rgb = np.repeat(g, 3, axis=2)
    hx_gray, _ = _phash_of(g)
    hx_rgb, _ = _phash_of(rgb)
    assert hx_gray == hx_rgb


def test_phash_near_pairs_exact_recall(spark):
    """Banded blocking must return EXACTLY the brute-force Hamming-ball
    pairs (pigeonhole recall), never a superset or subset."""
    rng = np.random.RandomState(7)
    imgs = []
    for i in range(6):  # brightness ladder: near-dups of one scene
        img = np.clip(_grad_img().astype(np.int64) + 7 * i, 0, 255)
        imgs.append(img.astype(np.uint8))
    for _ in range(6):  # unrelated noise fields: far from everything
        imgs.append(rng.randint(0, 256, (32, 32, 1)).astype(np.uint8))
    media = _media(spark, [encode_netpbm(x) for x in imgs])
    max_h = 6
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_near_pairs(media, max_hamming=max_h).collect()
    }
    bits = {
        r["doc_id"]: r["phash_bits"] for r in image_phash(media).collect()
    }
    want = {}
    for a in bits:
        for b in bits:
            if a < b:
                d = bin((bits[a] ^ bits[b]) & (2**64 - 1)).count("1")
                if d <= max_h:
                    want[(a, b)] = d
    assert got == want and want  # non-trivial: at least one near pair


def test_phash_poison_payload_degrades(spark):
    good = encode_netpbm(_grad_img())
    rows = {
        r["doc_id"]: r
        for r in image_phash(_media(spark, [good, b"\x00garbage"])).collect()
    }
    assert rows[0]["phash"] is not None and len(rows[0]["phash"]) == 16
    assert rows[1]["phash"] is None and rows[1]["phash_bits"] is None
    assert (
        phash_near_pairs(
            _media(spark, [good, b"\x00junk"]), max_hamming=63
        ).count()
        == 0
    )
