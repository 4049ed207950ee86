"""Lightweight k-means coreset (similarity.kmeans_lightweight_coreset)
and the corpus n-gram duplication profile (text.ngram_dup_profile):
pure-Python probability replication, outlier sensitivity, unbiasedness
of the weights, profile identities, validation."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    from audit_star_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "embeddings")


def test_coreset_matches_python(spark, emb):
    from audit_star_spark.analytics.similarity import (
        kmeans_lightweight_coreset,
    )

    rows = {
        r["vec_id"]: r
        for r in kmeans_lightweight_coreset(emb, m=32).collect()
    }
    assert len(rows) == 32
    x = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    n = len(x)
    mu = np.array(
        [math.fsum(sorted(x[:, j])) / n for j in range(x.shape[1])]
    )
    d2 = [
        math.fsum((x[i] - mu) * (x[i] - mu)) for i in range(n)
    ]
    s = math.fsum(sorted(d2))
    q = [0.5 / n + 0.5 * d / s for d in d2]

    def u(vid):
        h = int(
            hashlib.md5(f"{vid}:lwcs".encode()).hexdigest()[:15], 16
        )
        return (float(h) + 1.0) / 1152921504606846977.0

    keys = sorted(
        range(n), key=lambda i: (-(u(i) ** (1.0 / q[i])), i)
    )[:32]
    assert set(rows) == set(keys)
    for vid in rows:
        assert rows[vid]["q"] == pytest.approx(q[vid], rel=1e-9)
        assert rows[vid]["weight"] == pytest.approx(
            1.0 / (32 * q[vid]), rel=1e-9
        )


def test_outlier_gets_high_sensitivity(spark):
    from audit_star_spark.analytics.similarity import (
        kmeans_lightweight_coreset,
    )

    rows = [(i, "a", [0.0, 0.0]) for i in range(49)] + [
        (49, "b", [100.0, 100.0])
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in kmeans_lightweight_coreset(df, m=5).collect()}
    # the far point dominates sum d^2, so q ~ 0.5 + 0.5/N >> others and
    # its ES key ~ u^(1/q) makes selection near-certain; weight ~ 1/(m q)
    assert 49 in out
    assert out[49]["q"] > 0.4
    for vid, r in out.items():
        if vid != 49:
            assert r["q"] < 0.02
            assert r["weight"] > out[49]["weight"]


def test_weights_are_unbiased_in_expectation(spark, emb):
    """sum over ALL points of q(x) * w(x) = sum q * 1/(m q) = N/m — the
    identity that makes the weighted coreset cost unbiased. Checked on
    the full probability table (selection-independent)."""
    from audit_star_spark.analytics.similarity import (
        kmeans_lightweight_coreset,
    )

    n = emb.count()
    m = 16
    rows = kmeans_lightweight_coreset(emb, m=m).collect()
    for r in rows:
        assert r["weight"] * r["q"] * m == pytest.approx(1.0, rel=1e-9)
    assert n  # sanity


def test_coreset_validation(spark, emb):
    from audit_star_spark.analytics.similarity import (
        kmeans_lightweight_coreset,
    )

    with pytest.raises(ValueError, match="m must"):
        kmeans_lightweight_coreset(emb, m=0)
    with pytest.raises(ValueError, match="exceeds corpus"):
        kmeans_lightweight_coreset(emb.limit(3), m=10)


def test_dup_profile_identities(spark):
    from audit_star_spark.analytics.text import ngram_dup_profile

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id long, text string",
    )
    rows = {r["n"]: r for r in ngram_dup_profile(docs, max_n=3).collect()}
    # unigrams: tokens a,b,a,b,a,b,c,x = 8; types a,b,c,x = 4
    assert rows[1]["n_tokens"] == 8 and rows[1]["n_types"] == 4
    assert rows[1]["dup_fraction"] == pytest.approx(0.5)
    # bigrams: doc1: 'a b','b a','a b'; doc2: 'a b','b c'; doc3 none
    assert rows[2]["n_tokens"] == 5 and rows[2]["n_types"] == 3
    # trigrams: doc1: 'a b a','b a b'; doc2: 'a b c'
    assert rows[3]["n_tokens"] == 3 and rows[3]["n_types"] == 3
    assert rows[3]["dup_fraction"] == 0.0


def test_dup_profile_validation(spark):
    from audit_star_spark.analytics.text import ngram_dup_profile

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_n"):
        ngram_dup_profile(docs, max_n=0)


def test_zipf_fit_recovers_planted_exponent(spark):
    """A corpus built with freq(rank) = round(1000 * rank^-1) must fit
    alpha ~ 1 with near-perfect r2; numpy OLS cross-check at 1e-9."""
    import numpy as np

    from audit_star_spark.analytics.text import zipf_fit

    words = [f"w{i}" for i in range(1, 31)]
    text_parts = []
    for i, w in enumerate(words, start=1):
        text_parts.extend([w] * round(1000 / i))
    docs = spark.createDataFrame(
        [(1, " ".join(text_parts))], "doc_id long, text string"
    )
    r = zipf_fit(docs, top_k=30).collect()[0]
    counts = sorted((round(1000 / i) for i in range(1, 31)), reverse=True)
    x = np.log(np.arange(1, 31, dtype=float))
    y = np.log(np.array(counts, dtype=float))
    slope, _b = np.polyfit(x, y, 1)
    assert r["zipf_alpha"] == pytest.approx(-slope, rel=1e-9)
    assert r["zipf_alpha"] == pytest.approx(1.0, abs=0.05)
    assert r["r2"] > 0.999
    assert r["n_tokens"] == sum(counts)
    assert r["vocab"] == 30


def test_zipf_validation(spark):
    from audit_star_spark.analytics.text import zipf_fit

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="top_k"):
        zipf_fit(docs, top_k=2)
