"""Gate-vs-production parity for the ``bit_exact`` switch
(functions/folds.py): every operator whose corpus-sized float
reductions ship both forms — the sorted fold (gate, oracle bit-parity,
O(group) buffers) and plain SUM (production, map-side combinable, O(1)
buffers) — must agree to 1e-9 on the driver fixture. The sorted fold
is the repo's correctness anchor; these tests pin that the production
path computes the SAME mathematics, differing only in summation order
(last-ulp float noise), so a 100 TB run can flip the switch without a
semantic change.

Also pins the plan-shape claim that justifies the switch: the
production covariance aggregate contains a partial_sum (map-side
combine) and NO collect_list buffer.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    from audit_star_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def docs(spark):
    from audit_star_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "documents").limit(200)


def _frame_map(df, keys, val):
    return {
        tuple(r[k] for k in keys): float(r[val]) for r in df.collect()
    }


def _assert_close(gate, prod, rtol=1e-9, atol=1e-12):
    assert set(gate) == set(prod)
    for k in gate:
        assert gate[k] == pytest.approx(prod[k], rel=rtol, abs=atol), k


def test_covariance_parity(emb):
    from audit_star_spark.analytics.pca import covariance_table

    g = _frame_map(covariance_table(emb, bit_exact=True), ("i", "j"), "c")
    p = _frame_map(covariance_table(emb, bit_exact=False), ("i", "j"), "c")
    _assert_close(g, p)


def test_pca_components_parity(emb):
    from audit_star_spark.analytics.pca import pca_components

    g = _frame_map(
        pca_components(emb, k=2, n_iter=8, bit_exact=True),
        ("comp", "dim"),
        "loading",
    )
    p = _frame_map(
        pca_components(emb, k=2, n_iter=8, bit_exact=False),
        ("comp", "dim"),
        "loading",
    )
    # power iteration amplifies last-ulp covariance noise by at most
    # ~1/eigengap per step; 1e-7 on loadings is still far below any
    # consumer's tolerance and far above the observed difference
    _assert_close(g, p, rtol=1e-7, atol=1e-9)


def test_embedding_whiten_parity(emb):
    from audit_star_spark.analytics.pca import embedding_whiten

    g = {
        r["vec_id"]: list(r["embedding"])
        for r in embedding_whiten(emb, k=1, n_iter=8, bit_exact=True).collect()
    }
    p = {
        r["vec_id"]: list(r["embedding"])
        for r in embedding_whiten(emb, k=1, n_iter=8, bit_exact=False).collect()
    }
    assert set(g) == set(p)
    for k in g:
        np.testing.assert_allclose(g[k], p[k], rtol=1e-7, atol=1e-9)


def test_pq_train_parity(emb):
    from audit_star_spark.analytics.pq import pq_train

    def cents(bit_exact):
        cb = pq_train(emb, m_sub=4, k=16, iters=2, bit_exact=bit_exact)
        return {
            (r["sub_id"], r["cell_id"]): list(r["centroid"])
            for r in cb.collect()
        }

    g, p = cents(True), cents(False)
    assert set(g) == set(p)
    for k in g:
        np.testing.assert_allclose(g[k], p[k], rtol=1e-9, atol=1e-12)


def test_opq_train_parity(emb):
    from audit_star_spark.analytics.pq import opq_train

    def rots(bit_exact):
        rot, _cb = opq_train(emb, m_sub=4, k=16, bit_exact=bit_exact)
        return {r["p"]: (float(r["c"]), float(r["s"])) for r in rot.collect()}

    g, p = rots(True), rots(False)
    assert set(g) == set(p)
    for k in g:
        assert g[k][0] == pytest.approx(p[k][0], rel=1e-9, abs=1e-12)
        assert g[k][1] == pytest.approx(p[k][1], rel=1e-9, abs=1e-12)


def test_kmeans_update_parity(emb):
    from audit_star_spark.analytics.similarity import kmeans_update

    def cents(bit_exact):
        return {
            r["cell_id"]: list(r["centroid"])
            for r in kmeans_update(emb, n_cells=8, bit_exact=bit_exact).collect()
        }

    g, p = cents(True), cents(False)
    assert set(g) == set(p)
    for k in g:
        np.testing.assert_allclose(g[k], p[k], rtol=1e-9, atol=1e-12)


def test_classifier_parity(docs):
    from audit_star_spark.analytics.classifier import (
        hashed_features,
        score_docs,
        train_logreg,
    )

    labels = docs.select(
        "doc_id", (F.length("text") >= 200).cast("int").alias("label")
    )
    feats = hashed_features(docs, n_features=64)

    def probs(bit_exact):
        w = train_logreg(feats, labels, steps=2, bit_exact=bit_exact)
        return _frame_map(
            score_docs(feats, w, bit_exact=bit_exact), ("doc_id",), "prob"
        )

    _assert_close(probs(True), probs(False), rtol=1e-9, atol=1e-12)


def test_train_logreg_empty_labels_raises(spark, docs):
    from audit_star_spark.analytics.classifier import (
        hashed_features,
        train_logreg,
    )

    labels = (
        docs.select("doc_id", F.lit(1).alias("label")).filter(F.lit(False))
    )
    feats = hashed_features(docs.limit(5), n_features=16)
    with pytest.raises(ValueError, match="empty labels"):
        train_logreg(feats, labels)


def test_production_covariance_plan_shape(emb):
    """The justification for the switch, pinned in the plan: the
    production path's corpus-keyed aggregates (per-dimension mean,
    per-(i, j) product sum) run as plain sum with a MAP-SIDE partial
    (partial_sum before the exchange), and the only collect_list left
    is the bounded global D-row array reassembly (keys=[]) — never a
    keyed, corpus-sized buffer. The gate plan no longer buffers either:
    its corpus-keyed sums run STREAMED (sorted_stream_sum — repartition
    by key + in-partition ascending sort + plain sum), so the only
    collect_list in EITHER plan is the bounded global reassembly."""
    from audit_star_spark.analytics.pca import covariance_table

    prod = covariance_table(emb, bit_exact=False)
    plan = prod._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
    for line in plan.splitlines():
        if "collect_list" in line:
            assert "keys=[]" in line, line  # bounded global reassembly only
    gate = covariance_table(emb, bit_exact=True)
    gplan = gate._jdf.queryExecution().executedPlan().toString()
    for line in gplan.splitlines():
        if "collect_list" in line:
            assert "keys=[]" in line, line  # bounded global reassembly only
    # the streamed gate sum is only bit-exact if the in-partition Sort
    # SURVIVES below the aggregate (Spark's EliminateSorts keeps sorts
    # under order-RELEVANT aggs — Sum over DoubleType qualifies; this
    # pin catches any future rule change)
    assert "Sort" in gplan, gplan


def test_sorted_stream_sum_bit_parity(spark):
    """sorted_stream_sum must equal the SORTED_FOLD expression
    BIT-FOR-BIT (== on doubles, not approx): same ascending-order
    accumulation, different physical shape (streamed sum + spillable
    sort instead of an O(group) collect_list buffer)."""
    import random

    from audit_star_spark.functions.folds import (
        SORTED_FOLD,
        sorted_stream_sum,
    )

    rng = random.Random(14)
    rows = [
        (k, rng.uniform(-1e6, 1e6) * (10.0 ** rng.randint(-9, 9)))
        for k in range(37)
        for _ in range(rng.randint(1, 200))
    ]
    df = spark.createDataFrame(rows, "k int, v double").repartition(13)
    got = {
        r["k"]: r["s"]
        for r in sorted_stream_sum(df, ["k"], "v", "s").collect()
    }
    want = {
        r["k"]: r["s"]
        for r in df.groupBy("k")
        .agg(F.expr(SORTED_FOLD.format("v")).alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])  # bitwise

    plan = (
        sorted_stream_sum(df, ["k"], "v", "s")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Sort" in plan and "collect_list" not in plan, plan
