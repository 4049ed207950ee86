"""Property-based locks for round-4 primitives: the bottom-k Jaccard
estimator's exactness/bounds and URL-normalization idempotence."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _bottom_k_estimate(a: set, b: set, k: int) -> float:
    """Driver-side mirror of the estimator the streaming near-dup store
    evaluates in Spark SQL (slice of sorted arrays)."""
    sk_a = sorted(a)[:k]
    sk_b = sorted(b)[:k]
    union = sorted(set(sk_a) | set(sk_b))
    merged_k = set(union[:k])
    num = len(merged_k & set(sk_a) & set(sk_b))
    den = min(k, len(set(sk_a) | set(sk_b)))
    return num / den if den else 0.0


@given(
    st.sets(st.integers(0, 500), max_size=40),
    st.sets(st.integers(0, 500), max_size=40),
)
def test_bottom_k_exact_when_sets_fit(a, b):
    """|A|, |B| < k  =>  the estimator IS the exact Jaccard."""
    k = 64
    if not (a | b):
        return
    exact = len(a & b) / len(a | b)
    assert abs(_bottom_k_estimate(a, b, k) - exact) < 1e-12


@settings(max_examples=200)
@given(st.integers(0, 10_000), st.data())
def test_bottom_k_bounded_error_on_large_sets(seed, data):
    """Sampled regime: estimate stays within 5 std-errors of exact for
    overlapping random sets much larger than k."""
    import random

    k = 64
    rng = random.Random(seed)
    core = {rng.randrange(10**9) for _ in range(300)}
    a = core | {rng.randrange(10**9) for _ in range(150)}
    b = core | {rng.randrange(10**9) for _ in range(150)}
    exact = len(a & b) / len(a | b)
    est = _bottom_k_estimate(a, b, k)
    tol = 5 * math.sqrt(max(exact * (1 - exact), 0.01) / k)
    assert abs(est - exact) <= tol


def test_normalize_url_idempotence_via_spark(spark):
    """normalize(normalize(u)) == normalize(u) over a generated URL
    corpus — canonical keys must be fixed points or frontier dedup
    oscillates. Checked through the REAL Spark column expression."""
    import random

    from pyspark.sql import functions as F

    from audit_star_spark.analytics.html import normalize_url

    rng = random.Random(42)
    chars = "abcXYZ059-._~:/?#&=%"
    urls = []
    for scheme in ["http", "https", "HTTP", "ftp", ""]:
        for host in ["Example.COM", "host.io:80", "h.io:443", "a.b.c:8080"]:
            for _ in range(12):
                tail = "".join(rng.choice(chars) for _ in range(rng.randrange(30)))
                urls.append(
                    f"{scheme}://{host}/{tail}" if scheme else f"/{host}/{tail}"
                )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(normalize_url(F.col("url")).alias("url"))
    twice = once.select(normalize_url(F.col("url")).alias("n2"), "url")
    bad = twice.filter(F.col("n2") != F.col("url")).collect()
    assert bad == [], bad[:5]
