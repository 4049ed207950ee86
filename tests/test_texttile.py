"""TextTiling topic segmentation: hand-computed depth/cutoff on a
two-topic document, degenerate shapes, and plan discipline."""

import math

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_texttile_two_topic_document(spark):
    from audit_star_spark.analytics.text import texttile_boundaries

    # 16 tokens, w=4 -> blocks [aaaa][aaaa][bbbb][bbbb], gaps 0,1,2:
    # s = (1, 0, 1); depth = (0, 2, 0); mean = 2/3,
    # sigma = sqrt(((2/3)^2 + (4/3)^2 + (2/3)^2) / 3) = sqrt(8/9),
    # cutoff = 2/3 - sqrt(8/9)/2 -> only gap 1 is a boundary
    text = " ".join(["a"] * 8 + ["b"] * 8)
    got = {
        r["doc_id"]: r
        for r in texttile_boundaries(_docs(spark, [(0, text)]), w=4).collect()
    }
    r = got[0]
    assert r["n_gaps"] == 3
    assert r["n_boundaries"] == 1 and r["first_boundary"] == 1
    assert r["max_depth6"] == 2.0
    want_cutoff = 2 / 3 - math.sqrt(8 / 9) / 2
    assert r["cutoff6"] == pytest.approx(want_cutoff, abs=1e-6)


def test_texttile_uniform_and_short_docs(spark):
    from audit_star_spark.analytics.text import texttile_boundaries

    rows = [
        (0, " ".join(["x"] * 12)),  # uniform: all cosines 1, no boundary
        (1, "only three tokens"),  # < 2 full blocks -> no gaps -> absent
    ]
    got = {
        r["doc_id"]: r
        for r in texttile_boundaries(_docs(spark, rows), w=4).collect()
    }
    assert set(got) == {0}
    assert got[0]["n_boundaries"] == 0 and got[0]["first_boundary"] is None
    assert got[0]["max_depth6"] == 0.0 and got[0]["cutoff6"] == 0.0
    with pytest.raises(ValueError):
        texttile_boundaries(_docs(spark, rows), w=0)


def test_texttile_partial_tail_block_dropped(spark):
    from audit_star_spark.analytics.text import texttile_boundaries

    # 10 tokens at w=4 -> 2 full blocks + dropped tail of 2: ONE gap
    text = " ".join(["a"] * 4 + ["b"] * 4 + ["c"] * 2)
    r = texttile_boundaries(_docs(spark, [(0, text)]), w=4).collect()[0]
    assert r["n_gaps"] == 1
    # single gap: depth is 0 by construction, cutoff 0, no boundary
    assert r["n_boundaries"] == 0 and r["max_depth6"] == 0.0


def test_texttile_plan_windows_are_doc_partitioned(spark):
    from audit_star_spark.analytics.text import texttile_boundaries

    df = texttile_boundaries(
        _docs(spark, [(0, " ".join(["a"] * 8))]), w=4
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "partial" in plan.lower()
