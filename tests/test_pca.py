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


def test_deflation_recovers_top_two_components(spark):
    """Two planted high-variance axes: deflation must return them as
    components 1 and 2 with near-orthogonal loadings and decreasing
    eigenvalues; numpy eigh is the cross-check."""
    from audit_star_spark.analytics.pca import pca_components

    rows = []
    for i in range(300):
        base = [((i * 31 + d * 7) % 13 - 6) / 60.0 for d in range(8)]
        base[3] += ((i % 11) - 5) * 3.0   # strongest axis
        base[6] += ((i % 7) - 3) * 1.5    # second axis
        rows.append((i, [float(x) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = pca_components(emb, k=2, n_iter=20)
    comps = {}
    for r in got.collect():
        comps.setdefault(r["comp"], {})[r["dim"]] = (
            r["loading"], r["eigenvalue"], r["var_share"]
        )
    l1 = [comps[1][d][0] for d in range(8)]
    l2 = [comps[2][d][0] for d in range(8)]
    assert abs(l1[3]) > 0.99 and abs(l2[6]) > 0.99
    assert abs(sum(a * b for a, b in zip(l1, l2))) < 1e-6  # orthogonal
    e1, e2 = comps[1][0][1], comps[2][0][1]
    assert e1 > e2 > 0
    # numpy cross-check on the eigenvalues
    x = np.array([v for _, v in rows], dtype=np.float64)
    vals = np.linalg.eigvalsh(np.cov(x, rowvar=False, bias=True))
    assert e1 == pytest.approx(vals[-1], rel=1e-6)
    assert e2 == pytest.approx(vals[-2], rel=1e-4)
    shares = {comps[1][0][2], comps[2][0][2]}
    assert all(0 < s < 1 for s in shares)


def test_pca_components_validation(spark):
    from audit_star_spark.analytics.pca import pca_components

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        pca_components(emb, k=0)
    with pytest.raises(ValueError):
        pca_components(emb, k=3)  # k > dim
    with pytest.raises(ValueError):
        pca_components(emb, k=1, n_iter=0)


def test_whitening_removes_components_and_matches_deflation(spark):
    """embedding_whiten: projections of the whitened corpus onto the
    removed components are ~0; its empirical top component equals
    component k+1 of the original (the deflation identity); vectors are
    exactly centered."""
    from audit_star_spark.analytics.pca import (
        embedding_whiten,
        pca_components,
    )

    rows = []
    for i in range(300):
        base = [((i * 31 + d * 7) % 13 - 6) / 60.0 for d in range(8)]
        base[3] += ((i % 11) - 5) * 3.0
        base[6] += ((i % 7) - 3) * 1.5
        rows.append((i, [float(x) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    comps = pca_components(emb, k=2, n_iter=20)
    l1 = {
        r["dim"]: r["loading"] for r in comps.filter("comp = 1").collect()
    }
    wht = embedding_whiten(emb, k=1, n_iter=20)
    wr = {r["vec_id"]: r["embedding"] for r in wht.collect()}
    x = np.array([wr[i] for i in range(300)])
    # exactly centered and orthogonal to the removed component
    assert np.abs(x.mean(axis=0)).max() < 1e-9
    v1 = np.array([l1[d] for d in range(8)])
    assert np.abs(x @ v1).max() < 1e-9
    # top component of the whitened corpus == component 2 of the input
    w2 = pca_components(wht, k=1, n_iter=20)
    got2 = {r["dim"]: r["loading"] for r in w2.collect()}
    want2 = {
        r["dim"]: r["loading"] for r in comps.filter("comp = 2").collect()
    }
    for d in range(8):
        assert got2[d] == pytest.approx(want2[d], abs=1e-6), d
