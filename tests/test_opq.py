"""OPQ (analytics/pq.py opq_*) — Ge et al. 2013 restricted to
closed-form cross-subspace Givens rotations. The r9 residual-PQ test
pattern: assert the MECHANISM hard (quantization error must come out
lower than plain PQ at the same budget — that is what the rotation is
for), give recall a no-collapse floor (recall@k on 500 near-saturated
test vectors flips on single-rank noise), and lock the algebraic
invariants (orthogonality, norm preservation, identity fallback)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

M_SUB, K, DIM = 4, 16, 64


@pytest.fixture(scope="module")
def emb(spark):
    from audit_star_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def trained(spark, emb):
    from audit_star_spark.analytics.pq import opq_train

    return opq_train(emb, M_SUB, K)


def _mse(base, cb):
    from audit_star_spark.analytics.pq import _D2, _assign, _subvecs

    sub = _subvecs(base, DIM, M_SUB)
    a = _assign(sub, cb.select("sub_id", "cell_id", "centroid")).join(
        F.broadcast(cb.select("sub_id", "cell_id", "centroid")),
        ["sub_id", "cell_id"],
    )
    return (
        a.select(F.expr(_D2.format(a="svec", b="centroid")).alias("e"))
        .agg(F.avg("e"))
        .collect()[0][0]
    )


def test_opq_quantizes_tighter_than_plain_pq(spark, emb, trained):
    """The OPQ mechanism, asserted hard: after one monotone alternation
    (train -> reconstruct -> Givens rotate -> re-encode vs the SAME
    codebook -> one Lloyd re-mean) the per-subvector quantization MSE
    must be <= plain pq_train at identical m_sub/k. Every step of the
    alternation provably cannot raise the error (identity rotation and
    the old codes are feasible points), so < here is the learned-
    rotation win and == would mean the rotation degenerated."""
    from audit_star_spark.analytics.pq import _base, opq_rotate, pq_train

    base = _base(emb)
    plain = _mse(base, pq_train(emb, M_SUB, K, iters=1))
    rot, cb1 = trained
    opq = _mse(opq_rotate(base, rot, DIM), cb1)
    assert opq <= plain
    assert opq < plain * 0.999  # the rotation actually learned something


def test_rotation_is_orthogonal_and_norm_preserving(spark, emb, trained):
    from audit_star_spark.analytics.pq import _base, opq_rotate

    rot, _ = trained
    assert rot.count() == DIM // 2
    bad = rot.filter(
        F.abs(F.col("c") * F.col("c") + F.col("s") * F.col("s") - 1.0) > 1e-12
    ).count()
    assert bad == 0
    base = _base(emb)
    rb = opq_rotate(base, rot, DIM).select("vec_id", F.col("vec").alias("rv"))
    sq = "aggregate({0}, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x)"
    drift = (
        base.join(rb, "vec_id")
        .select(
            F.abs(
                F.expr(sq.format("vec")) - F.expr(sq.format("rv"))
            ).alias("d")
        )
        .agg(F.max("d"))
        .collect()[0][0]
    )
    assert drift < 1e-9


def test_recall_no_collapse_floor(spark, emb):
    from audit_star_spark.analytics.pq import opq_recall

    r = opq_recall(emb, M_SUB, K, n_queries=8, k_nn=5)
    rows = r.collect()
    assert len(rows) == 8
    # every query keeps schema; the mean recall must clear a coarse
    # floor (ADC with a learned rotation cannot be near-random)
    mean = sum(x["recall"] for x in rows) / len(rows)
    assert mean >= 0.15
    assert all(0.0 <= x["recall"] <= 1.0 for x in rows)


def test_zero_stats_pair_falls_back_to_identity(spark):
    """A pair with T = W = 0 (r = 0) must produce (c, s) = (1, 0) — the
    identity rotation, not a 0/0 NaN."""
    from audit_star_spark.analytics.pq import opq_rotation, pq_train

    # all-zero vectors: reconstruction y = 0, so every pair stat is 0
    emb = spark.range(20).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 8), i -> CAST(0.0 AS FLOAT))").alias(
            "embedding"
        ),
    )
    cb = pq_train(emb, m_sub=2, k=4, iters=1)
    from audit_star_spark.analytics.pq import _base

    rot = opq_rotation(_base(emb), cb, 8, 2)
    rows = {r["p"]: (r["c"], r["s"]) for r in rot.collect()}
    assert rows == {p: (1.0, 0.0) for p in range(4)}


def test_rotated_queries_rank_like_sql_definition(spark, emb, trained):
    """Cross-check the in-row rotate expression against a independent
    per-dimension computation (posexplode + join) — guards the 1-based
    element_at indexing the oracle relies on."""
    from audit_star_spark.analytics.pq import _base, opq_rotate

    rot, _ = trained
    base = _base(emb).filter(F.col("vec_id") < 5)
    fast = opq_rotate(base, rot, DIM).select(
        "vec_id", F.posexplode("vec").alias("i", "got")
    )
    h = DIM // 2
    dims = base.select("vec_id", F.posexplode("vec").alias("g", "x"))
    lo = dims.filter(F.col("g") < h).select(
        "vec_id", F.col("g").alias("p"), F.col("x").alias("xp")
    )
    hi = dims.filter(F.col("g") >= h).select(
        "vec_id", (F.col("g") - h).alias("p"), F.col("x").alias("xq")
    )
    slow = (
        lo.join(hi, ["vec_id", "p"])
        .join(F.broadcast(rot), "p")
        .select(
            "vec_id",
            F.col("p").alias("i_lo"),
            (F.col("c") * F.col("xp") - F.col("s") * F.col("xq")).alias("w_lo"),
            (F.col("p") + h).alias("i_hi"),
            (F.col("s") * F.col("xp") + F.col("c") * F.col("xq")).alias("w_hi"),
        )
    )
    want = {}
    for r in slow.collect():
        want[(r["vec_id"], r["i_lo"])] = r["w_lo"]
        want[(r["vec_id"], r["i_hi"])] = r["w_hi"]
    got = {(r["vec_id"], r["i"]): r["got"] for r in fast.collect()}
    assert got.keys() == want.keys()
    for key in got:
        assert got[key] == pytest.approx(want[key], abs=0.0), key
