"""Winnowing fingerprints (analytics/winnow.py — Schleimer et al.
2003): pure-Python replication (same rolling hash, same rightmost-min
rule), the paper's detection guarantee (shared runs >= w + k - 1 always
collide; runs < k never do), selection density, short-document edges,
the ubiquity cap, and the in-row plan shape (no explode before the
fingerprint set)."""

import hashlib

import pytest

from audit_star_spark.analytics.text import FP_PRIME
from audit_star_spark.analytics.winnow import (
    winnow_fingerprints,
    winnow_near_pairs,
)


def _h60(tok):
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


def _py_winnow(text, k, w):
    toks = text.strip().lower().split()
    th = [_h60(t) for t in toks]
    kg = []
    for i in range(len(th) - k + 1):
        h = 0
        for t in th[i : i + k]:
            h = (h * 31 + t % FP_PRIME) % FP_PRIME
        kg.append(h)
    if not kg:
        return set()
    n_win = len(kg) - w + 1 if len(kg) >= w else 1
    out = set()
    for s in range(n_win):
        best_p, best_h = -1, None
        for j in range(s, min(s + w, len(kg))):
            if best_h is None or kg[j] <= best_h:  # rightmost tie-break
                best_p, best_h = j + 1, kg[j]
        out.add((best_p, best_h))
    return out


TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog today and more words"),
    (2, "a a a a a a a a"),  # all-equal hashes: tie-break stress
    (3, "one two three"),  # exactly k tokens at k=3
    (4, "xy"),  # shorter than k: no fingerprints
    (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
]


def test_matches_python_reference(spark):
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(docs, k=3, w=3).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for doc_id, text in TEXTS:
        assert got.get(doc_id, set()) == _py_winnow(text, 3, 3), doc_id


def test_detection_guarantee(spark):
    """A shared run of exactly w + k - 1 tokens MUST share a
    fingerprint hash; disjoint texts share none."""
    k = w = 4
    run = "u1 u2 u3 u4 u5 u6 u7"  # w + k - 1 = 7 tokens
    docs = spark.createDataFrame(
        [
            (1, f"aa bb cc {run} dd ee"),
            (2, f"zz yy {run} xx ww vv"),
            (3, "pp qq rr ss tt uu vv2 ww2 xx2"),
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnow_fingerprints(docs, k=k, w=w).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_tie_break_is_rightmost(spark):
    """All-identical k-grams: every window selects its RIGHTMOST
    position, so the selected positions are w, w+1, ..., len(kg)."""
    docs = spark.createDataFrame([(1, "a a a a a a a a")], "doc_id long, text string")
    rows = winnow_fingerprints(docs, k=3, w=3).collect()
    # 8 tokens -> 6 k-grams -> windows at 1..4 select pos 3, 4, 5, 6
    assert sorted(r["pos"] for r in rows) == [3, 4, 5, 6]


def test_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two three"), (3, "one two three four")],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(docs, k=3, w=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc  # < k tokens: nothing
    assert len(by_doc[2]) == 1  # single k-gram: one window over all
    assert len(by_doc[3]) == 1  # 2 k-grams < w: still one window


def test_near_pairs_and_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "pre the quick brown fox jumps over the lazy dog today post"),
            (3, "unrelated content entirely here my good friends of ours"),
        ],
        "doc_id long, text string",
    )
    rows = winnow_near_pairs(docs, k=3, w=3, min_shared=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["overlap"] == pytest.approx(1.0)  # doc 1 fully contained


def test_max_doc_freq_drops_ubiquitous(spark):
    """A k-gram present in EVERY doc is dropped by the ubiquity cap, so
    pairs sharing only boilerplate disappear."""
    boiler = "same old boilerplate footer text repeated on every page"
    docs = spark.createDataFrame(
        [(i, f"unique{i} thing{i} object{i} {boiler}") for i in range(1, 6)],
        "doc_id long, text string",
    )
    uncapped = winnow_near_pairs(docs, k=4, w=2, min_shared=1)
    capped = winnow_near_pairs(docs, k=4, w=2, min_shared=1, max_doc_freq=3)
    assert uncapped.count() > 0
    assert capped.count() == 0


def test_plan_is_in_row_until_fingerprints(spark):
    """The k-gram hashing and window selection must not shuffle: the
    fingerprint frame's plan has no Exchange below the explode."""
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    plan = (
        winnow_fingerprints(docs, k=3, w=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_validation(spark):
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    with pytest.raises(ValueError, match="k and w"):
        winnow_fingerprints(docs, k=0)
    with pytest.raises(ValueError, match="min_shared"):
        winnow_near_pairs(docs, min_shared=0)
