"""Matryoshka truncation recall and cluster-balanced sampling
(analytics/similarity.py): numpy reference parity, the full-prefix
identity (recall@full_dim == 1), monotone-ish coverage invariants, the
per-cell cap, assignment consistency with kmeans_update, and
validation."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    from audit_star_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def mat(emb):
    from audit_star_spark.analytics.similarity import matryoshka_recall

    return matryoshka_recall(emb, dims=(16, 64), n_queries=4, k=5).collect()


def _np_topk(x, d, n_queries, k):
    xd = x[:, :d]
    nrm = np.linalg.norm(xd, axis=1)
    out = {}
    for q in range(n_queries):
        cos = (xd @ xd[q]) / (nrm * nrm[q])
        order = sorted(
            (i for i in range(len(x)) if i != q),
            key=lambda i: (-cos[i], i),
        )
        out[q] = set(order[:k])
    return out


def test_matches_numpy(spark, emb, mat):
    x = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    full = _np_topk(x, x.shape[1], 4, 5)
    got = {(r["prefix_dim"], r["query_id"]): r["n_hits"] for r in mat}
    for d in (16, 64):
        pre = _np_topk(x, d, 4, 5)
        for q in range(4):
            assert got[(d, q)] == len(full[q] & pre[q]), (d, q)


def test_full_prefix_recall_is_one(mat, emb):
    dim = len(emb.first()["embedding"])
    assert dim == 64
    for r in mat:
        if r["prefix_dim"] == 64:
            assert r["recall"] == pytest.approx(1.0)
        assert 0.0 <= r["recall"] <= 1.0


def test_matryoshka_validation(emb):
    from audit_star_spark.analytics.similarity import matryoshka_recall

    with pytest.raises(ValueError, match="non-empty"):
        matryoshka_recall(emb, dims=())
    with pytest.raises(ValueError, match="within"):
        matryoshka_recall(emb, dims=(128,))


def test_cluster_balanced_sample(spark, emb):
    from audit_star_spark.analytics.similarity import (
        cluster_balanced_sample,
        kmeans_update,
    )

    rows = cluster_balanced_sample(emb, n_cells=8, per_cell=3).collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell_id"], []).append(r["vec_id"])
    # cap respected; every non-empty cell contributes
    assert all(len(v) <= 3 for v in by_cell.values())
    occupied = {
        r["cell_id"] for r in kmeans_update(emb, n_cells=8).collect()
    }
    assert set(by_cell) == occupied
    # determinism: the md5 key family makes reruns identical
    again = cluster_balanced_sample(emb, n_cells=8, per_cell=3).collect()
    assert sorted((r["cell_id"], r["vec_id"]) for r in rows) == sorted(
        (r["cell_id"], r["vec_id"]) for r in again
    )
    # the selected ids per cell are the smallest md5 keys of that cell's
    # members — spot-check one cell against a python replay
    def key(vid):
        return int(
            hashlib.md5(f"{vid}:cbs".encode()).hexdigest()[:15], 16
        )

    from audit_star_spark.analytics.similarity import _assign_to_cells, _prepared

    base = _prepared(emb)
    cents = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    members = {}
    for r in _assign_to_cells(base, cents).select("vec_id", "cell_id").collect():
        members.setdefault(r["cell_id"], []).append(r["vec_id"])
    c = sorted(by_cell)[0]
    want = sorted(members[c], key=lambda v: (key(v), v))[:3]
    assert sorted(by_cell[c]) == sorted(want)


def test_cbs_validation(emb):
    from audit_star_spark.analytics.similarity import cluster_balanced_sample

    with pytest.raises(ValueError, match="per_cell"):
        cluster_balanced_sample(emb, per_cell=0)


def test_incontext_order_positions_and_coherence(spark, emb):
    """ICP ordering invariants: positions are gapless 1..N over the
    whole corpus, cells are contiguous runs, within-cell similarity is
    non-increasing, the window and distributed modes agree exactly, and
    the assignment matches a numpy argmax replay."""
    from audit_star_spark.analytics.similarity import incontext_order

    rows_d = incontext_order(emb, n_cells=8, mode="distributed").collect()
    rows_w = incontext_order(emb, n_cells=8, mode="window").collect()
    as_map = lambda rs: {  # noqa: E731
        r["vec_id"]: (r["cell_id"], r["sim6"], r["position"]) for r in rs
    }
    assert as_map(rows_d) == as_map(rows_w)
    n = emb.count()
    ordered = sorted(rows_d, key=lambda r: r["position"])
    assert [r["position"] for r in ordered] == list(range(1, n + 1))
    for a, b in zip(ordered, ordered[1:]):
        if a["cell_id"] == b["cell_id"]:
            assert a["sim6"] >= b["sim6"]  # most-central first
        else:
            assert a["cell_id"] < b["cell_id"]  # cells are contiguous
    # numpy argmax replay of the assignment
    pdf = emb.select("vec_id", "embedding").toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=float)
            for r in pdf.itertuples()}
    cents = {c: vecs[c] / np.linalg.norm(vecs[c]) for c in range(8)}
    got = {r["vec_id"]: r["cell_id"] for r in rows_d}
    for vid, v in vecs.items():
        sims = {c: float(np.dot(cv, v / np.linalg.norm(v)))
                for c, cv in cents.items()}
        best = max(sims, key=lambda c: (sims[c], -c))
        # tie-break: highest sim, then LOWEST cell id
        assert got[vid] == best, vid


def test_incontext_order_sparse_ids(spark, emb):
    """Sparse/offset vec_ids must produce the SAME ordering as dense
    ids (translated), not a silent empty result: the density probe
    falls back to the n_cells smallest ids as centroids, which for a
    monotonic id transform are the same vectors."""
    from audit_star_spark.analytics.similarity import incontext_order

    dense = incontext_order(emb, n_cells=8, mode="distributed").collect()
    shifted = emb.withColumn(
        "vec_id", (F.col("vec_id") * 3 + 1000).cast("long")
    )
    sparse = incontext_order(shifted, n_cells=8, mode="distributed").collect()
    assert len(sparse) == len(dense) > 0
    tr = lambda v: v * 3 + 1000  # noqa: E731
    want = {tr(r["vec_id"]): (tr(r["cell_id"]), r["sim6"], r["position"])
            for r in dense}
    got = {r["vec_id"]: (r["cell_id"], r["sim6"], r["position"])
           for r in sparse}
    assert got == want


def test_incontext_order_empty_corpus(spark, emb):
    from audit_star_spark.analytics.similarity import incontext_order

    with pytest.raises(ValueError, match="empty corpus"):
        incontext_order(emb.filter(F.lit(False)), n_cells=8)


def test_duplicate_dims_deduped(spark, emb):
    """A duplicated prefix dim must not double its candidate stream
    (which would fill that prefix's top-k with doubled vec_ids and
    double-count recall hits): results equal the deduped call."""
    from audit_star_spark.analytics.similarity import matryoshka_recall

    dup = matryoshka_recall(
        emb, dims=(16, 16, 64, 16), n_queries=4, k=5
    ).collect()
    ref = matryoshka_recall(emb, dims=(16, 64), n_queries=4, k=5).collect()
    key = lambda r: (r["prefix_dim"], r["query_id"])  # noqa: E731
    assert sorted(map(tuple, dup)) == sorted(map(tuple, ref))
    assert {key(r) for r in dup} == {key(r) for r in ref}
