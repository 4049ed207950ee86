"""Table profiler: null/distinct accounting, typed min/max slots, column
subsets, and the approx-distinct scale path."""

import datetime as dt

import pytest

from audit_star_spark.analytics.profile import profile_table


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 1.5, dt.datetime(2024, 1, 1)),
            (2, None, -2.0, dt.datetime(2024, 1, 3)),
            (None, "b", None, None),
            (2, "a", 0.0, dt.datetime(2024, 1, 2)),
        ],
        "k long, s string, x double, t timestamp",
    )


def test_profile_counts_and_typed_slots(spark):
    got = {r["column"]: r for r in profile_table(_df(spark)).collect()}
    assert set(got) == {"k", "s", "x", "t"}
    k, s, x, t = got["k"], got["s"], got["x"], got["t"]
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (k["n_nulls"], k["n_distinct"], k["num_min"], k["num_max"]) == (1, 2, 1.0, 2.0)
    assert (s["n_nulls"], s["n_distinct"], s["str_min"], s["str_max"]) == (1, 2, "a", "b")
    assert (x["num_min"], x["num_max"]) == (-2.0, 1.5)
    assert x["str_min"] is None and k["ts_min"] is None
    assert t["ts_min"] == dt.datetime(2024, 1, 1)
    assert t["ts_max"] == dt.datetime(2024, 1, 3)
    assert t["dtype"] == "timestamp"


def test_profile_column_subset_and_errors(spark):
    got = profile_table(_df(spark), columns=["s"]).collect()
    assert [r["column"] for r in got] == ["s"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(_df(spark), columns=["nope"])


def test_profile_approx_distinct_path(spark):
    got = {
        r["column"]: r
        for r in profile_table(_df(spark), exact_distinct=False).collect()
    }
    # HLL on 4 rows is exact in practice; the contract is "plausible
    # cardinality", the rest of the row is unchanged
    assert got["k"]["n_distinct"] == 2
    assert got["k"]["n_nulls"] == 1
