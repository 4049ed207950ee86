"""Validation rule engine on deliberately dirty data: every rule class
counts its violations exactly, and the whole row-level batch stays one
scan."""

import pytest
from pyspark.sql import functions as F

from audit_star_spark.operators.validate import (
    check_rules,
    in_range,
    matches,
    not_null,
)


def _dirty(spark):
    return spark.createDataFrame(
        [
            (1, 10, 5.0, "1-OK"),
            (2, None, -1.0, "9-BAD"),
            (2, 20, 150.0, None),
            (None, 30, None, "2-OK"),
        ],
        "id long, ref long, x double, tag string",
    )


def test_every_rule_class_counts_exactly(spark):
    ref = spark.createDataFrame([(10,), (20,)], "k long")
    got = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in check_rules(
            _dirty(spark),
            row_rules=[
                not_null("ref"),
                in_range("x", 0, 100),
                matches("tag", "^[1-5]-"),
            ],
            unique_cols=["id"],
            foreign_keys=[("ref", ref, "k")],
        ).collect()
    }
    assert got["not_null(ref)"] == (1, False)
    # NULL x does not violate the range rule; -1 and 150 do
    assert got["in_range(x, 0, 100)"] == (2, False)
    # NULL tag passes matches; "9-BAD" fails
    assert got["matches(tag)"] == (1, False)
    # 4 rows, values {1, 2, 2, NULL} -> 3 distinct incl. the null bucket
    assert got["unique(id)"] == (1, False)
    # non-null refs {10, 20, 30}: 30 missing from the reference
    assert got["foreign_key(ref)"] == (1, False)


def test_clean_frame_passes_and_empty_rules_rejected(spark):
    df = _dirty(spark).filter(F.col("id") == 1)
    got = check_rules(df, row_rules=[not_null("ref")]).collect()
    assert [(r["n_violations"], r["passed"]) for r in got] == [(0, True)]
    with pytest.raises(ValueError, match="no rules"):
        check_rules(df)


def test_row_rules_and_uniqueness_share_one_scan(spark):
    df = _dirty(spark)
    report = check_rules(
        df,
        row_rules=[not_null("ref"), in_range("x", 0, 100)],
        unique_cols=["id"],
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") == 1, plan
