"""Product quantization (analytics/pq.py): codebook/code shapes, the
exact-regime invariant (enough codewords -> ADC IS the exact ranking),
and determinism."""

import pytest
from pyspark.sql import functions as F

from audit_star_spark.analytics.pq import (
    pq_adc_topk,
    pq_encode,
    pq_recall,
    pq_train,
)
from tests.conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_codebook_and_code_shapes(spark):
    emb = _emb(spark)
    cb = pq_train(emb, m_sub=4, k=16)
    rows = cb.collect()
    assert {r["sub_id"] for r in rows} == {0, 1, 2, 3}
    assert all(0 <= r["cell_id"] < 16 for r in rows)
    assert all(len(r["centroid"]) == 16 for r in rows)  # 64 / 4 dims
    codes = pq_encode(emb, cb, m_sub=4).collect()
    assert len(codes) == emb.count()
    assert all(len(r["codes"]) == 4 for r in codes)
    assert all(0 <= c < 16 for r in codes for c in r["codes"])


def test_exact_regime_recall_is_one(spark):
    """With as many codewords as vectors, every vector is its own
    codeword after the seeded round — ADC distances equal exact
    distances and recall is 1.0 for every query."""
    emb = _emb(spark).filter(F.col("vec_id") < 16)
    out = pq_recall(emb, m_sub=4, k=16, n_queries=4, k_nn=3).collect()
    assert len(out) == 4
    assert all(r["recall"] == 1.0 for r in out)


def test_adc_ranks_are_deterministic(spark):
    emb = _emb(spark)
    cb = pq_train(emb, m_sub=4, k=16)
    codes = pq_encode(emb, cb, m_sub=4)
    a = sorted(map(tuple, pq_adc_topk(emb, cb, codes, 4, 5, 4).collect()))
    b = sorted(map(tuple, pq_adc_topk(emb, cb, codes, 4, 5, 4).collect()))
    assert a == b
    by_q = {}
    for q, v, adc, rank in a:
        by_q.setdefault(q, []).append((rank, adc))
    for q, rs in by_q.items():
        rs.sort()
        assert [r for r, _ in rs] == [1, 2, 3, 4, 5]
        assert all(rs[i][1] <= rs[i + 1][1] for i in range(len(rs) - 1))


def test_more_iterations_do_not_break_encoding(spark):
    emb = _emb(spark).filter(F.col("vec_id") < 64)
    cb2 = pq_train(emb, m_sub=4, k=8, iters=2)
    codes = pq_encode(emb, cb2, m_sub=4).collect()
    assert all(len(r["codes"]) == 4 for r in codes)


def test_dim_must_divide(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError):
        pq_train(emb, m_sub=7, k=4)
    with pytest.raises(ValueError):
        pq_train(emb, m_sub=4, k=4, iters=0)
