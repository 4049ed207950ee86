"""Weighted sampling without replacement (text.weighted_sample):
inclusion-probability bias, determinism, degenerate weights, and the
TakeOrderedAndProject plan."""

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, w double")


def test_heavy_weights_dominate_the_sample(spark):
    """100 rows: 10 with weight 1000, 90 with weight 1 — a k=10 sample
    must be mostly (not necessarily exclusively) heavy rows, and every
    heavy row wins a k=50 sample."""
    from audit_star_spark.analytics.text import weighted_sample

    rows = [(i, 1000.0 if i < 10 else 1.0) for i in range(100)]
    docs = _docs(spark, rows)
    got10 = {r["doc_id"] for r in weighted_sample(docs, "w", k=10).collect()}
    assert len(got10) == 10
    assert len([d for d in got10 if d < 10]) >= 7
    got50 = {r["doc_id"] for r in weighted_sample(docs, "w", k=50).collect()}
    assert set(range(10)) <= got50


def test_sample_is_deterministic_and_nested_by_k(spark):
    """Re-running returns byte-identical rows, and the k=5 sample is a
    prefix of the k=20 sample (top-k by a fixed key is nested)."""
    from audit_star_spark.analytics.text import weighted_sample

    docs = _docs(spark, [(i, float(1 + i % 7)) for i in range(200)])
    a = [r["doc_id"] for r in weighted_sample(docs, "w", k=20).collect()]
    b = [r["doc_id"] for r in weighted_sample(docs, "w", k=20).collect()]
    assert a == b
    small = [r["doc_id"] for r in weighted_sample(docs, "w", k=5).collect()]
    assert small == a[:5]


def test_nonpositive_and_null_weights_never_sampled(spark):
    from audit_star_spark.analytics.text import weighted_sample

    docs = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -2.0), (4, None), (5, 1.0)],
        "doc_id long, w double",
    )
    got = {r["doc_id"] for r in weighted_sample(docs, "w", k=10).collect()}
    assert got == {1, 5}
    with pytest.raises(ValueError, match="positive"):
        weighted_sample(docs, "w", k=0)


def test_uniform_weights_rate_is_calibrated(spark):
    """With equal weights the draw is uniform: sampling k=100 of 1000
    rows flagged into two halves should hit each half ~50 times."""
    from audit_star_spark.analytics.text import weighted_sample

    docs = _docs(spark, [(i, 1.0) for i in range(1000)])
    got = [r["doc_id"] for r in weighted_sample(docs, "w", k=100).collect()]
    lower = sum(1 for d in got if d < 500)
    assert 30 <= lower <= 70  # ~Binomial(100, .5), 4-sigma band


def test_plan_is_takeordered_no_global_sort(spark):
    from audit_star_spark.analytics.text import weighted_sample
    from audit_star_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", F.length("text").cast("double").alias("w")
    )
    plan = (
        weighted_sample(docs, "w", k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Python" not in plan, plan
