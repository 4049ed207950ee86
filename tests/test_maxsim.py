"""ColBERT MaxSim late-interaction reranking: hand-scored corpus,
candidate restriction, zero-norm guard, k truncation, plan shape."""

import math

import pytest


def _toks(spark, rows, idcol):
    return spark.createDataFrame(
        rows, f"{idcol} long, tok_idx int, vec array<double>"
    )


def _cand(spark, pairs):
    return spark.createDataFrame(pairs, "query_id long, doc_id long")


def test_maxsim_hand_scores(spark):
    from audit_star_spark.analytics.similarity import maxsim_rerank

    # query 0 tokens: unit x, unit y
    q = _toks(
        spark,
        [(0, 0, [1.0, 0.0]), (0, 1, [0.0, 1.0])],
        "query_id",
    )
    # doc 10: exact match on both axes -> 1 + 1 = 2
    # doc 11: diagonal tokens -> max cos per query token = 1/sqrt(2); sum = sqrt(2)
    # doc 12: only x-axis content -> 1 + 0 = 1
    d = _toks(
        spark,
        [
            (10, 0, [1.0, 0.0]),
            (10, 1, [0.0, 1.0]),
            (11, 0, [1.0, 1.0]),
            (12, 0, [2.0, 0.0]),
            (12, 1, [3.0, 0.0]),
        ],
        "doc_id",
    )
    cand = _cand(spark, [(0, 10), (0, 11), (0, 12)])
    got = {
        r["doc_id"]: r
        for r in maxsim_rerank(q, d, cand, k=10).collect()
    }
    assert got[10]["score6"] == 2.0 and got[10]["rank"] == 1
    assert got[11]["score6"] == pytest.approx(math.sqrt(2), abs=1e-6)
    assert got[11]["rank"] == 2
    assert got[12]["score6"] == 1.0 and got[12]["rank"] == 3


def test_maxsim_scores_only_candidates_and_truncates(spark):
    from audit_star_spark.analytics.similarity import maxsim_rerank

    q = _toks(spark, [(0, 0, [1.0, 0.0])], "query_id")
    d = _toks(
        spark,
        [(i, 0, [1.0, float(i)]) for i in range(5)],
        "doc_id",
    )
    # doc 3 is NOT a candidate: it must never appear, however similar
    cand = _cand(spark, [(0, 0), (0, 1), (0, 2), (0, 4)])
    rows = maxsim_rerank(q, d, cand, k=2).collect()
    assert {r["doc_id"] for r in rows} == {0, 1}  # top-2 by cosine
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2]
    with pytest.raises(ValueError):
        maxsim_rerank(q, d, cand, k=0)


def test_maxsim_zero_norm_tokens_dropped(spark):
    from audit_star_spark.analytics.similarity import maxsim_rerank

    # query has one real token and one zero token; doc 1 has only a
    # zero token -> no scorable pair -> doc 1 absent entirely
    q = _toks(
        spark, [(0, 0, [1.0, 0.0]), (0, 1, [0.0, 0.0])], "query_id"
    )
    d = _toks(
        spark,
        [(1, 0, [0.0, 0.0]), (2, 0, [1.0, 0.0])],
        "doc_id",
    )
    got = {
        r["doc_id"]: r
        for r in maxsim_rerank(
            q, d, _cand(spark, [(0, 1), (0, 2)]), k=5
        ).collect()
    }
    assert set(got) == {2}
    # the zero query token contributes nothing: score is 1.0, not NaN
    assert got[2]["score6"] == 1.0


def test_maxsim_plan_has_no_cross_join(spark):
    from audit_star_spark.analytics.similarity import maxsim_rerank

    q = _toks(spark, [(0, 0, [1.0, 0.0])], "query_id")
    d = _toks(spark, [(1, 0, [1.0, 0.0])], "doc_id")
    plan = (
        maxsim_rerank(q, d, _cand(spark, [(0, 1)]), k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()  # map-side combine on the MAX agg
