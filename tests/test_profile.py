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


def test_numeric_histogram_buckets_and_edges(spark):
    from audit_star_spark.analytics.profile import numeric_histogram

    df = spark.createDataFrame(
        [(0.0,), (2.5,), (5.0,), (9.9,), (10.0,), (None,)], "x double"
    )
    got = {r["bucket"]: r for r in numeric_histogram(df, "x", bins=4).collect()}
    # range [0, 10], width 2.5; max value inclusive in the LAST bucket;
    # 2.5 lands in bucket 1 (left-closed buckets); NULL dropped
    assert {b: r["n"] for b, r in got.items()} == {0: 1, 1: 1, 2: 1, 3: 2}
    assert got[0]["lo_edge"] == 0.0 and got[0]["hi_edge"] == 2.5
    assert got[3]["lo_edge"] == 7.5 and got[3]["hi_edge"] == 10.0
    # explicit bounds: out-of-range clamps into the edge buckets
    clamped = {
        r["bucket"]: r["n"]
        for r in numeric_histogram(df, "x", bins=2, lo=0.0, hi=5.0).collect()
    }
    assert clamped == {0: 1, 1: 4}


def test_numeric_histogram_constant_and_errors(spark):
    import pytest

    from audit_star_spark.analytics.profile import numeric_histogram

    const = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    [r] = numeric_histogram(const, "x", bins=5).collect()
    assert (r["bucket"], r["n"]) == (0, 2)
    with pytest.raises(ValueError, match="bins"):
        numeric_histogram(const, "x", bins=0)


def test_numeric_histogram_matches_numpy_model(spark):
    """Model-based: our convention (left-closed equi-width bins, top edge
    inclusive) is exactly numpy.histogram's — random data must agree
    bucket for bucket."""
    import random

    import numpy as np

    from audit_star_spark.analytics.profile import numeric_histogram

    rng = random.Random(11)
    xs = [rng.uniform(-50, 200) for _ in range(500)] + [-50.0, 200.0]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    for bins in (1, 7, 16):
        got = {
            r["bucket"]: r["n"]
            for r in numeric_histogram(df, "x", bins=bins).collect()
        }
        want, _edges = np.histogram(np.array(xs), bins=bins)
        assert got == {i: int(n) for i, n in enumerate(want) if n > 0}, bins


def test_distinct_contract_flags_violations(spark):
    """The nd_ok gate is a real check: feeding it a deliberately wrong
    'estimate' must flip the flag. Here we just lock that the real HLL
    passes and that the tolerance math rejects a 2x-off count."""
    from audit_star_spark.analytics.profile import profile_distinct_contract

    df = spark.range(0, 5000).selectExpr(
        "id AS k", "CAST(id % 97 AS STRING) AS s"
    )
    rows = {r["column"]: r for r in profile_distinct_contract(df).collect()}
    assert rows["k"]["nd_ok"] and rows["s"]["nd_ok"]
    assert rows["k"]["n_rows"] == 5000 and rows["k"]["n_nulls"] == 0
    # tolerance math: 4 sigma at rsd=0.05 is 20% — a 2x error must fail
    exact, approx = 5000.0, 10000.0
    tol = max(4.0 * 0.05 * exact, 4.0)
    assert abs(approx - exact) > tol
