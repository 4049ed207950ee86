"""Geometric median by smoothed Weiszfeld (analytics/robust.py):
numpy replication at 1e-9, the robustness property that motivates it
(one planted outlier drags the mean, barely moves the median),
objective descent (Weiszfeld is monotone in the sum of distances),
bit_exact parity, validation."""

import math

import numpy as np
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    from audit_star_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "embeddings")


def _np_weiszfeld(x, n_iter, eps=1e-12):
    c = np.array(
        [math.fsum(sorted(x[:, j])) / len(x) for j in range(x.shape[1])]
    )
    for _ in range(n_iter):
        d = np.maximum(np.sqrt(((x - c) ** 2).sum(axis=1)), eps)
        c = (x / d[:, None]).sum(axis=0) / (1.0 / d).sum()
    return c


def test_matches_numpy(spark, emb):
    from audit_star_spark.analytics.robust import geometric_median

    x = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    want = _np_weiszfeld(x, 3)
    got = geometric_median(emb, n_iter=3).collect()[0]["gm"]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_outlier_drags_mean_not_median(spark):
    from audit_star_spark.analytics.robust import robust_center_report

    rows = [(i, "a", [float(i % 3) - 1.0, 0.0]) for i in range(50)] + [
        (50, "b", [1000.0, 1000.0])
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    rep = {r["dim"]: r for r in robust_center_report(df, n_iter=8).collect()}
    # the outlier adds ~1000/51 ~ 19.6 to the mean of each axis; the
    # geometric median stays near the bulk
    assert rep[0]["mean"] > 15
    assert abs(rep[0]["gmedian"]) < 2
    assert rep[0]["drag"] > 13
    assert rep[1]["mean"] > 15
    assert abs(rep[1]["gmedian"]) < 2


def test_weiszfeld_objective_descends(spark, emb):
    """sum ||x - c_t|| is non-increasing across Weiszfeld iterations
    (the classical monotonicity) — checked via numpy on the iterates."""
    from audit_star_spark.analytics.robust import geometric_median

    x = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )

    def cost(c):
        return float(np.sqrt(((x - c) ** 2).sum(axis=1)).sum())

    costs = []
    for t in range(0, 4):
        if t == 0:
            c = x.mean(axis=0)
        else:
            c = np.array(geometric_median(emb, n_iter=t).collect()[0]["gm"])
        costs.append(cost(c))
    assert all(b <= a + 1e-9 for a, b in zip(costs, costs[1:]))


def test_bit_exact_parity(spark, emb):
    from audit_star_spark.analytics.robust import geometric_median

    g = geometric_median(emb, n_iter=2, bit_exact=True).collect()[0]["gm"]
    p = geometric_median(emb, n_iter=2, bit_exact=False).collect()[0]["gm"]
    np.testing.assert_allclose(g, p, rtol=1e-9, atol=1e-12)


def test_validation(spark, emb):
    from audit_star_spark.analytics.robust import geometric_median

    with pytest.raises(ValueError, match="n_iter"):
        geometric_median(emb, n_iter=0)
    import pyspark.sql.functions as F

    with pytest.raises(ValueError, match="empty"):
        geometric_median(emb.filter(F.lit(False)))
