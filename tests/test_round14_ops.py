"""Round-14 operators: CLIP-style paired alignment census."""

from pyspark.sql import functions as F


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "pair_id long, label int, img_vec array<double>, txt_vec array<double>"
    )


def test_clip_alignment_zero_norm_is_unscorable(spark):
    from audit_star_spark.analytics.similarity import clip_alignment_census

    rows = [
        (0, 1, [1.0, 0.0], [1.0, 0.0]),  # sim 1.0 -> aligned
        (1, 1, [1.0, 0.0], [0.0, 1.0]),  # sim 0.0 -> not aligned
        (2, 1, [0.0, 0.0], [1.0, 0.0]),  # zero-norm image -> unscorable
        (3, 1, [1.0, 0.0], [0.0, 0.0]),  # zero-norm caption -> unscorable
        (4, 2, [0.0, 0.0], [0.0, 0.0]),  # label with ONLY unscorable pairs
    ]
    got = {
        r["label"]: r
        for r in clip_alignment_census(_pairs(spark, rows), threshold=0.28).collect()
    }
    assert got[1]["n_pairs"] == 4
    assert got[1]["n_scored"] == 2  # zero-norm pairs never score
    assert got[1]["n_aligned"] == 1
    assert got[1]["frac_aligned6"] == 0.5
    assert got[1]["min_sim6"] == 0.0 and got[1]["max_sim6"] == 1.0
    # all-unscorable label: counted, never divided by zero, NULL stats
    assert got[2]["n_pairs"] == 1 and got[2]["n_scored"] == 0
    assert got[2]["n_aligned"] == 0
    assert got[2]["frac_aligned6"] is None
    assert got[2]["avg_sim6"] is None


def test_clip_alignment_plan_is_join_free(spark):
    """The census must stay one scan + one map-side-combined aggregate:
    no join, no broadcast, no window — the operator's 100 TB contract
    (the gate's pair synthesis is plumbing OUTSIDE the operator)."""
    from audit_star_spark.analytics.similarity import clip_alignment_census

    df = clip_alignment_census(
        _pairs(spark, [(0, 1, [1.0, 0.0], [1.0, 0.0])])
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" not in plan
    # partial (map-side) aggregation before the single label exchange
    assert "partial" in plan.lower()
