"""Exact-recall lock for the multi-band Hamming blocking.

Pigeonhole blocking (dedup.hamming_bands) must find EVERY pair within
the Hamming threshold — brute force over all pairs is the ground truth.
The old single-prefix bucket missed pairs differing in a high bit; these
tests would fail under that scheme.
"""

import numpy as np

from audit_star_spark.analytics.dedup import hamming_bands


def test_hamming_bands_rejects_degenerate_threshold():
    """max_hamming >= total_bits means EVERY pair qualifies, but bitwise
    complements differ in every 1-bit band and never collide — band
    blocking cannot deliver exact recall there, so it must refuse."""
    import pytest

    for total, maxh in [(64, 64), (64, 200), (60, 60)]:
        with pytest.raises(ValueError, match="all-pairs"):
            hamming_bands(total, maxh)


def test_hamming_bands_partition_and_cap():
    for total, maxh in [(60, 8), (64, 6), (64, 0), (64, 63), (60, 59)]:
        bands = hamming_bands(total, maxh)
        assert sum(w for _, w in bands) == total
        assert all(w >= 1 for _, w in bands)
        starts = [s for s, _ in bands]
        assert starts[0] == 0
        for (s, w), s2 in zip(bands, starts[1:]):
            assert s + w == s2
        assert len(bands) == min(maxh + 1, total)


def test_simhash_near_pairs_bruteforce_equivalence(spark):
    """The multi-band result equals the all-pairs brute force exactly —
    100% recall AND no spurious pairs — on the real sf0.001 corpus."""
    from audit_star_spark.analytics.dedup import (
        simhash_fingerprints,
        simhash_near_pairs,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    fp = simhash_fingerprints(docs).collect()
    ids = np.array([r["doc_id"] for r in fp])
    hs = np.array([r["simhash"] for r in fp], dtype=np.int64)
    # brute force: popcount of xor over the full pair matrix
    x = hs[:, None] ^ hs[None, :]
    ham = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for _ in range(64):
        ham += v & 1
        v >>= 1
        v &= np.int64(0x7FFFFFFFFFFFFFFF)  # logical shift
    iu = np.triu_indices(len(ids), k=1)
    mask = ham[iu] <= 8
    want = {
        (min(a, b), max(a, b), int(h))
        for a, b, h in zip(ids[iu[0]][mask], ids[iu[1]][mask], ham[iu][mask])
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(docs, max_hamming=8).collect()
    }
    assert got == want
    assert len(want) > 0  # the corpus has simhash near-dups to find


def test_ahash_high_bit_pair_is_found(spark):
    """A pair differing ONLY in the hash's top bits — invisible to the
    old 16-bit-prefix bucket — must be found by the band blocking."""
    from audit_star_spark.analytics.multimodal import (
        ahash_near_pairs,
        encode_netpbm,
    )

    base = np.zeros((8, 8, 1), dtype=np.uint8)
    base[:, 4:, 0] = 200  # rows of 0f -> ahash 0f0f...
    var = base.copy()
    var[0, 0, 0] = 255  # first sampled cell -> flips the TOP bit only
    media = spark.createDataFrame(
        [(0, bytearray(encode_netpbm(base))), (1, bytearray(encode_netpbm(var)))],
        "doc_id long, payload binary",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in ahash_near_pairs(media, max_hamming=2).collect()
    }
    assert pairs == {(0, 1): 1}
