"""JL random projection: exact matrix application, norm-preservation
statistics on real embeddings, determinism across seeds, and the
zero-shuffle plan."""

import math

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_one_hot_vectors_return_matrix_columns(spark):
    """Projecting e_i must return column i of the sign matrix exactly —
    the operator IS the matrix multiply."""
    from audit_star_spark.analytics.similarity import (
        project_embeddings,
        projection_matrix,
    )

    m = projection_matrix(8, out_dim=4, seed=7)
    rows = [(i, [1.0 if j == i else 0.0 for j in range(8)], 0) for i in range(8)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["vec_id"]: r["proj"]
        for r in project_embeddings(emb, in_dim=8, out_dim=4, seed=7).collect()
    }
    for i in range(8):
        want = [m[j][i] for j in range(4)]
        assert got[i] == pytest.approx(want, abs=0.0), i


def test_projection_preserves_norms_statistically(spark):
    """E[|Px|^2] = |x|^2 for the sign matrix: over the real corpus the
    mean squared distortion must be near 1 and every sampled pair within
    a loose JL band."""
    from audit_star_spark.analytics.similarity import projection_distortion

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = projection_distortion(emb).collect()
    assert len(rows) >= 15
    sq = [r["distortion"] ** 2 for r in rows]
    assert abs(float(np.mean(sq)) - 1.0) < 0.25
    for r in rows:
        assert 0.4 < r["distortion"] < 1.8, r


def test_matrix_is_seed_deterministic_and_scaled(spark):
    from audit_star_spark.analytics.similarity import projection_matrix

    a = projection_matrix(64, out_dim=16, seed=7)
    b = projection_matrix(64, out_dim=16, seed=7)
    c = projection_matrix(64, out_dim=16, seed=8)
    assert a == b
    assert a != c
    scale = 1 / math.sqrt(16)
    assert {abs(x) for row in a for x in row} == {scale}


def test_projection_plan_zero_shuffle_no_python(spark):
    """The projection is pure in-row expression algebra: no Exchange, no
    Python, one scan."""
    from audit_star_spark.analytics.similarity import project_embeddings

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = (
        project_embeddings(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_embedding_outliers_flags_planted_garbage(spark):
    """Plant a far-away vector among the real corpus: it must be the
    top-z row and flagged; real vectors keep modest z; mean z ~ 0."""
    import numpy as np
    from pyspark.sql import functions as F

    from audit_star_spark.analytics.similarity import embedding_outliers

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    garbage = spark.createDataFrame(
        [(99999, [100.0] * 64, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    out = embedding_outliers(emb.unionByName(garbage)).collect()
    by_id = {r["vec_id"]: r for r in out}
    top = max(out, key=lambda r: r["z"])
    assert top["vec_id"] == 99999 and top["is_outlier"]
    zs = [r["z"] for r in out]
    assert abs(float(np.mean(zs))) < 1e-9  # z-scores center exactly
    assert sum(1 for r in out if r["is_outlier"]) <= 5


def test_embedding_outliers_plan_no_python_no_keyed_shuffle(spark):
    from audit_star_spark.analytics.similarity import embedding_outliers

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = (
        embedding_outliers(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "collect_list" not in plan, plan


def test_projected_recall_beats_chance_and_is_exact_on_clusters(spark):
    """Two contracts: (1) on the near-uniform synthetic corpus the
    projected recall must clearly beat the k/N chance level; (2) on
    well-separated clusters the projection preserves the neighborhood
    exactly (recall 1.0) — the realistic-embedding case."""
    import numpy as np

    from audit_star_spark.analytics.similarity import projected_recall

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = projected_recall(emb, n_queries=8, k=10).collect()
    n = emb.count()
    chance = 10.0 / n
    mean_recall = sum(r["recall"] for r in rows) / len(rows)
    assert mean_recall > 5 * chance, (mean_recall, chance)

    # 4 tight clusters of 15 vectors: near-ties WITHIN a cluster may
    # reorder under projection (identity recall < 1 is expected), but
    # cluster MEMBERSHIP of the projected top-10 must be perfect — the
    # property that matters for real clustered embeddings
    from audit_star_spark.analytics.similarity import projected_topk

    rng = np.random.default_rng(2)
    centers = rng.normal(0, 10, (4, 64))
    data = [
        (int(c * 15 + i), (centers[c] + rng.normal(0, 0.01, 64)).tolist(), c)
        for c in range(4)
        for i in range(15)
    ]
    clustered = spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    )
    top = projected_topk(clustered, n_queries=4, k=10).collect()
    assert len(top) == 40
    for r in top:
        assert r["vec_id"] // 15 == r["query_id"] // 15, r
