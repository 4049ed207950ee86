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


def test_alpha_mix_boosts_low_resource_sources(spark):
    """p ∝ share^alpha with alpha < 1 downsamples the BIG source: its
    raw_rate is the minimum, so after max-normalization the small
    source binds at rate 1.0 and the big one keeps proportionally
    less — closed-form checkable at alpha = 0.5."""
    from audit_star_spark.analytics.text import alpha_mix_report

    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, source string",
    )
    rows = {r["source"]: r for r in alpha_mix_report(docs, alpha=0.5).collect()}
    assert rows["small"]["rate"] == 1.0          # low-resource binds
    assert 0 < rows["big"]["rate"] < 1.0         # big source downsampled
    # alpha=0.5 math: rate_big = (sqrt(.9)/sqrt(.1)) / (.9/.1) = 1/3
    assert abs(rows["big"]["rate"] - (0.9 ** 0.5 / 0.1 ** 0.5) / 9) < 1e-9
    assert rows["big"]["n_kept"] < 900 and rows["small"]["n_kept"] == 100
    # alpha=1 is the identity mix
    ident = {r["source"]: r for r in alpha_mix_report(docs, alpha=1.0).collect()}
    assert all(r["rate"] == 1.0 for r in ident.values())
    import pytest as _pytest

    with _pytest.raises(ValueError):
        alpha_mix_report(docs, alpha=0.0)
