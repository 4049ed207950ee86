"""FastSS fuzzy linkage (analytics/linkage.py): exact equivalence to
the all-pairs levenshtein join, collision false-positive filtering,
degenerate inputs."""

import itertools

import pytest
from pyspark.sql import functions as F

from audit_star_spark.analytics.linkage import (
    _variants_expr,
    fuzzy_link_lev1,
    fuzzy_pairs_lev1,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


WORDS = [
    "alpha", "alhpa", "alpa", "alphax", "beta", "betta", "bet", "",
    "a", "b", "ab", "ax", "xb", "gamma", "gamma", "gäma", "gämma",
]


def test_pairs_equal_all_pairs_bruteforce(spark):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "id long, s string"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs_lev1(df, "id", "s").collect()
    )
    want = sorted(
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(WORDS), 2)
        if _lev(a, b) <= 1
    )
    assert got == want
    # the corpus exercises both regimes: equal strings and dist-1 pairs
    assert any(d == 0 for *_, d in want) and any(d == 1 for *_, d in want)


def test_collision_candidates_are_filtered(spark):
    """del1("ax") ∩ del1("xb") = {"x"} but lev = 2 — the verify filter
    must drop the shared-variant false candidate."""
    df = spark.createDataFrame([(0, "ax"), (1, "xb")], "id long, s string")
    assert fuzzy_pairs_lev1(df, "id", "s").count() == 0


def test_cross_relation_link_equals_bruteforce(spark):
    left = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS[:8])], "id long, s string"
    )
    right = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS[5:])], "id long, s string"
    )
    got = sorted(
        (r["id_l"], r["id_r"], r["dist"])
        for r in fuzzy_link_lev1(left, right, "id", "s", "id", "s").collect()
    )
    want = sorted(
        (i, j, _lev(a, b))
        for i, a in enumerate(WORDS[:8])
        for j, b in enumerate(WORDS[5:])
        if _lev(a, b) <= 1
    )
    assert got == want


def test_empty_string_guard(spark):
    """'' links to every single-char string (insertion) and to itself —
    and the sequence(1, 0) counts-down pitfall must not fire."""
    df = spark.createDataFrame(
        [(0, ""), (1, "x"), (2, "xy")], "id long, s string"
    )
    got = {
        (r["id_a"], r["id_b"]) for r in fuzzy_pairs_lev1(df, "id", "s").collect()
    }
    assert got == {(0, 1), (1, 2)}


def test_null_strings_dropped(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "x")], "id long, s string"
    )
    assert fuzzy_pairs_lev1(df, "id", "s").count() == 0


def test_candidate_volume_is_bounded_not_quadratic(spark):
    """Distinct unrelated strings generate NO candidate pairs at all —
    the blocking never degenerates to an all-pairs comparison."""
    import hashlib

    rows = [
        (i, hashlib.md5(str(i).encode()).hexdigest()[:12]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    a = df.selectExpr("id AS id_a", f"explode({_variants_expr('s')}) AS v")
    b = df.selectExpr("id AS id_b", f"explode({_variants_expr('s')}) AS v")
    n_cand = (
        a.join(b, "v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    # unrelated 12-hex-char strings share no deletion variant: the
    # blocking produces NO candidates (vs n^2/2 = 44850 comparisons)
    assert n_cand == 0, n_cand
