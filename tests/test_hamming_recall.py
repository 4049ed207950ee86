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


def test_string_subst_pairs_bruteforce_equivalence(spark):
    """Segment blocking equals all-pairs brute force — 100% recall AND
    no spurious pairs — on random strings with planted near-dups."""
    import random

    from audit_star_spark.analytics.dedup import string_subst_pairs

    rng = random.Random(9)
    base = ["".join(rng.choice("abcdef") for _ in range(12)) for _ in range(30)]
    rows = []
    rid = 0
    for s in base:
        rows.append((rid, s)); rid += 1
        if rng.random() < 0.5:  # plant a 1- or 2-sub variant
            t = list(s)
            for _ in range(rng.randint(1, 2)):
                p = rng.randrange(12)
                t[p] = rng.choice("xyz")
            rows.append((rid, "".join(t))); rid += 1
    df = spark.createDataFrame(rows, "doc_id long, s string")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in string_subst_pairs(df, "s", max_subs=2).collect()
    }
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i][1], rows[j][1]
            if len(a) == len(b):
                d = sum(1 for x, y in zip(a, b) if x != y)
                if d <= 2:
                    want.add((rows[i][0], rows[j][0], d))
    assert got == want and want  # non-vacuous


def test_string_subst_pairs_edges(spark):
    import pytest

    from audit_star_spark.analytics.dedup import string_subst_pairs

    df = spark.createDataFrame(
        [(1, "abcd"), (2, "abcd"), (3, "abce"), (4, "abcde"), (5, "")],
        "doc_id long, s string",
    )
    # d=0: exact equality only
    got0 = {(r["id_a"], r["id_b"]) for r in string_subst_pairs(df, "s", 0).collect()}
    assert got0 == {(1, 2)}
    # unequal lengths never pair; empty strings drop
    got1 = {(r["id_a"], r["id_b"]) for r in string_subst_pairs(df, "s", 1).collect()}
    assert got1 == {(1, 2), (1, 3), (2, 3)}
    with pytest.raises(ValueError, match="max_subs"):
        string_subst_pairs(df, "s", -1)


def test_string_subst_pairs_short_string_guard(spark):
    """Strings shorter than max_subs+1 chars take the direct length-keyed
    path: output still equals brute force, each pair is generated exactly
    once (no zero-width-segment '' blocking key, no per-segment duplicate
    candidates, no DISTINCT shuffle). The plan lock below would fail on
    the old code, whose short strings went through the segment explode.
    """
    from audit_star_spark.analytics.dedup import string_subst_pairs

    # short-heavy corpus: 1- and 2-char IDs/titles plus a few long rows
    rows = [
        (0, "a"), (1, "b"), (2, "a"), (3, "c"),
        (4, "ab"), (5, "ba"), (6, "xy"), (7, "ab"),
        (8, "abcdef"), (9, "abcxef"), (10, "zzzzzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, s string")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in string_subst_pairs(df, "s", max_subs=2).collect()
    }
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i][1], rows[j][1]
            if len(a) == len(b):
                d = sum(1 for x, y in zip(a, b) if x != y)
                if d <= 2:
                    want.add((rows[i][0], rows[j][0], d))
    assert got == want and want
    # every 1-char and 2-char same-length pair is within 2 subs by
    # definition -> candidates == matches (O(matches), not n-fold dup)
    short_pairs = {(x, y) for (x, y, _) in got if len(rows[x][1]) < 3}
    assert len(short_pairs) == 6 + 6  # C(4,2) 1-char + C(4,2) 2-char

    # plan lock: length routing exists — the segment/explode branch only
    # admits slen >= max_subs+1 and the direct branch only slen < that.
    # The old code had no routing (every row hit the explode + DISTINCT).
    plan = (
        string_subst_pairs(df, "s", max_subs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "length(s" in plan and ">= 3" in plan, plan
    assert "< 3" in plan, plan
