"""NN-Descent kNN graph (analytics/knn_graph.py): descent must
actually descend (recall strictly improves over the random seed and
keeps rising), per-node degree caps, seed self-loop freedom,
determinism, numpy cross-check of reported recall, and validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    from audit_star_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "embeddings")


def _mean_recall(emb, rounds, k=8):
    from audit_star_spark.analytics.knn_graph import knn_graph_recall

    rows = knn_graph_recall(emb, k=k, rounds=rounds, n_eval=8).collect()
    assert len(rows) == 8
    return sum(r["recall"] for r in rows) / len(rows)


def test_descent_improves_recall(emb):
    r0 = _mean_recall(emb, rounds=0)
    r1 = _mean_recall(emb, rounds=1)
    r2 = _mean_recall(emb, rounds=2)
    # random seed ~ chance level (k/N); each round must climb decisively
    assert r0 < 0.2
    assert r1 > r0 + 0.2
    assert r2 > r1


def test_graph_shape_and_determinism(emb):
    from audit_star_spark.analytics.knn_graph import knn_graph

    g = knn_graph(emb, k=4, rounds=1)
    rows = g.collect()
    by_src = {}
    for r in rows:
        assert r["src"] != r["dst"]
        by_src.setdefault(r["src"], []).append(r["rank"])
    n = emb.count()
    assert len(by_src) == n  # every node has out-edges (random seed)
    for ranks in by_src.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 4
    again = knn_graph(emb, k=4, rounds=1).collect()
    assert sorted((r["src"], r["dst"]) for r in rows) == sorted(
        (r["src"], r["dst"]) for r in again
    )


def test_recall_matches_numpy(spark, emb):
    """The reported recall is exactly |graph ∩ exact topk| / k under
    numpy's ranking of the same vectors (same tie-break)."""
    from audit_star_spark.analytics.knn_graph import (
        knn_graph,
        knn_graph_recall,
    )

    k, rounds, n_eval = 6, 1, 4
    x = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    nrm = np.linalg.norm(x, axis=1)
    g = {}
    for r in knn_graph(emb, k=k, rounds=rounds).collect():
        if r["src"] < n_eval:
            g.setdefault(r["src"], set()).add(r["dst"])
    got = {
        r["src"]: r["n_hits"]
        for r in knn_graph_recall(emb, k=k, rounds=rounds, n_eval=n_eval).collect()
    }
    for q in range(n_eval):
        cos = (x @ x[q]) / (nrm * nrm[q])
        order = sorted(
            (i for i in range(len(x)) if i != q), key=lambda i: (-cos[i], i)
        )
        exact = set(order[:k])
        assert got[q] == len(exact & g.get(q, set())), q


def test_validation(emb, spark):
    from audit_star_spark.analytics.knn_graph import knn_graph

    with pytest.raises(ValueError, match="k must"):
        knn_graph(emb, k=0)
    with pytest.raises(ValueError, match="rounds"):
        knn_graph(emb, rounds=-1)
    one = emb.filter(F.col("vec_id") == 0)
    with pytest.raises(ValueError, match="at least 2"):
        knn_graph(one)


def test_sparse_offset_ids_match_dense(spark, emb):
    """Seed arithmetic assumes dense 0..n-1 ids; sparse or offset
    vec_ids must be ranked gapless first and translated back, giving
    the SAME graph up to the id relabeling (the r11 verdict nit: ids
    like 1000, 1007, ... used to alias seed destinations onto missing
    vertices and silently under-seed nodes)."""
    from audit_star_spark.analytics.knn_graph import knn_graph

    small = emb.filter(F.col("vec_id") < 32)
    dense = {
        (r["src"], r["rank"]): (r["dst"], round(r["cosine"], 9))
        for r in knn_graph(small, k=4, rounds=1).collect()
    }
    # offset + gappy relabel that PRESERVES vec_id order, so the
    # gapless rank maps sparse id 1000 + 7*i back to dense id i
    sparse = small.withColumn(
        "vec_id", (F.col("vec_id") * 7 + 1000).cast("long")
    )
    got = {
        ((r["src"] - 1000) // 7, r["rank"]): (
            (r["dst"] - 1000) // 7,
            round(r["cosine"], 9),
        )
        for r in knn_graph(sparse, k=4, rounds=1).collect()
    }
    assert got == dense
    # and every node is fully seeded: exactly k out-edges each
    from collections import Counter

    deg = Counter(s for s, _rk in got)
    assert set(deg.values()) == {4}
