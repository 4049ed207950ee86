"""PCA top component by power iteration (analytics/pca.py): numpy
eigensolver cross-check (the thing the SQL-replayable power iteration
must converge to), unit norm + sign convention, variance-share bounds,
and a planted-dominant-direction recovery test."""

import numpy as np
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    from audit_star_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "embeddings")


def _np_top(x):
    c = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(c)
    v = vecs[:, -1]
    if v[0] < 0:
        v = -v
    return vals[-1], v, np.trace(c)


def test_matches_numpy_eigh(spark, emb):
    """Convergence toward numpy's eigensolver, calibrated to the data:
    the synthetic embeddings are near-isotropic (lam2/lam1 ~ 0.93), so
    after k power iterations the angle error is ~(lam2/lam1)^k — the
    test derives its own tolerance from the measured eigengap instead
    of assuming a gap the fixture does not have. The trace is exact;
    the Rayleigh quotient can never exceed lam1 and its error is
    QUADRATIC in the angle."""
    c = np.cov(
        np.array(
            [r["embedding"] for r in emb.orderBy("vec_id").collect()],
            dtype=np.float64,
        ),
        rowvar=False,
        bias=True,
    )
    vals, vecs = np.linalg.eigh(c)
    lam, v, tr = vals[-1], vecs[:, -1], np.trace(c)
    if v[0] < 0:
        v = -v
    n_iter = 60
    resid = (vals[-2] / vals[-1]) ** n_iter  # ~0.015 on this fixture
    from audit_star_spark.analytics.pca import pca_top_component

    loadings, stats = pca_top_component(emb, n_iter=n_iter)
    got = np.array([r["loading"] for r in loadings.orderBy("dim").collect()])
    st = stats.collect()[0]
    assert abs(float(np.dot(got, v))) > 1.0 - 4 * resid
    assert st["eigenvalue"] <= lam * (1.0 + 1e-9)
    assert st["eigenvalue"] == pytest.approx(lam, rel=8 * resid**2 + 1e-9)
    assert st["trace"] == pytest.approx(tr, rel=1e-9)
    assert 0.0 < st["var_share"] < 1.0


def test_unit_norm_and_sign_convention(spark, emb):
    from audit_star_spark.analytics.pca import pca_top_component

    loadings, _ = pca_top_component(emb, n_iter=8)
    rows = {r["dim"]: r["loading"] for r in loadings.collect()}
    assert len(rows) == 64
    assert sum(x * x for x in rows.values()) == pytest.approx(1.0, abs=1e-9)
    assert rows[0] >= 0.0  # the cross-engine sign pin


def test_recovers_planted_direction(spark):
    """Synthetic corpus with a dominant axis along dim 3: the power
    iteration must put most of its weight there."""
    from audit_star_spark.analytics.pca import pca_top_component

    rng_rows = []
    for i in range(200):
        base = [((i * 31 + d * 7) % 13 - 6) / 40.0 for d in range(8)]
        base[3] += ((i % 11) - 5) * 2.0  # planted high-variance axis
        rng_rows.append((i, [float(x) for x in base]))
    emb = spark.createDataFrame(rng_rows, "vec_id long, embedding array<float>")
    loadings, stats = pca_top_component(emb, n_iter=12)
    rows = {r["dim"]: r["loading"] for r in loadings.collect()}
    assert abs(rows[3]) > 0.99
    assert stats.collect()[0]["var_share"] > 0.9


def test_validation(spark, emb):
    from audit_star_spark.analytics.pca import (
        covariance_table,
        pca_top_component,
    )

    with pytest.raises(ValueError):
        pca_top_component(emb, n_iter=0)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        covariance_table(empty, dim=8)
