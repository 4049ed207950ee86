"""Ranged (interval) aggregate join + time-series resample/funnel:
model-based checks against driver-side brute force, edge semantics, and
the no-nested-loop plan lock."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from audit_star_spark.analytics.timeseries import event_funnel, resample_events
from audit_star_spark.operators.ranged import ranged_count_join

T0 = dt.datetime(2024, 1, 1)


def _ts(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def test_ranged_count_join_matches_bruteforce(spark):
    rng = random.Random(7)
    left = [(i, rng.randrange(5), _ts(rng.uniform(0, 3600))) for i in range(40)]
    right = [
        (rng.randrange(5), _ts(rng.uniform(-300, 3900)), rng.choice(["a", "b"]))
        for _ in range(200)
    ]
    ldf = spark.createDataFrame(left, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "k long, ts timestamp, tag string")
    lower, upper = -120.0, 30.0
    got = {
        r["lid"]: (r["n_a"], r["n_all"])
        for r in ranged_count_join(
            ldf,
            rdf,
            keys=["k"],
            left_ts="ts",
            right_ts="ts",
            lower_s=lower,
            upper_s=upper,
            bucket_s=60,
            counts={"n_a": F.col("r_tag") == "a", "n_all": None},
            carry_right=("tag",),
        ).collect()
    }
    for lid, k, lts in left:
        n_a = n_all = 0
        for rk, rts, tag in right:
            if rk == k and lts + dt.timedelta(seconds=lower) <= rts < lts + dt.timedelta(seconds=upper):
                n_all += 1
                n_a += tag == "a"
        assert got[lid] == (n_a, n_all), f"lid={lid}"
    assert len(got) == len(left)  # zero-match left rows kept with count 0


def test_ranged_count_join_default_bucket_and_count(spark):
    ldf = spark.createDataFrame([(1, _ts(100))], "k long, ts timestamp")
    rdf = spark.createDataFrame(
        [(1, _ts(99.9999)), (1, _ts(100)), (1, _ts(50)), (2, _ts(99))],
        "k long, ts timestamp",
    )
    # window [ts-60, ts): strictly-before semantics, key must match
    [row] = ranged_count_join(
        ldf, rdf, keys=["k"], left_ts="ts", right_ts="ts", lower_s=-60, upper_s=0
    ).collect()
    assert row["n_in_range"] == 2  # 99.9999s and 50s; 100s excluded, key 2 excluded


def test_ranged_count_join_rejects_bad_windows(spark):
    df = spark.createDataFrame([(1, T0)], "k long, ts timestamp")
    with pytest.raises(ValueError, match="empty window"):
        ranged_count_join(df, df, ["k"], "ts", "ts", 10, 10)
    with pytest.raises(ValueError, match="bucket_s"):
        ranged_count_join(df, df, ["k"], "ts", "ts", 0, 10, bucket_s=0)


def test_ranged_join_plan_is_bucketed_equi_join(spark):
    ldf = spark.createDataFrame([(1, T0)], "k long, ts timestamp")
    rdf = spark.createDataFrame([(1, T0)], "k long, ts timestamp")
    df = ranged_count_join(ldf, rdf, ["k"], "ts", "ts", -60, 0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_resample_gap_fill_and_locf(spark):
    # type x: data in hours 0 and 2 (gap at 1); type y: hour 1 only.
    # global bounds are hours 0..2, so every type gets 3 buckets.
    events = spark.createDataFrame(
        [
            (1, _ts(60), 1, "x", 10.0, ""),
            (2, _ts(120), 1, "x", 20.0, ""),
            (3, _ts(2 * 3600 + 60), 1, "x", 7.0, ""),
            (4, _ts(3600 + 5), 2, "y", 5.0, ""),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = {
        (r["event_type"], r["bucket"].hour): r
        for r in resample_events(events, bucket="hour").collect()
    }
    assert len(rows) == 6
    x0, x1, x2 = rows[("x", 0)], rows[("x", 1)], rows[("x", 2)]
    assert (x0["n_events"], x0["total_value"], x0["is_gap"]) == (2, 30.0, False)
    assert x0["avg_value_locf"] == 15.0
    assert (x1["n_events"], x1["total_value"], x1["is_gap"]) == (0, 0.0, True)
    assert x1["avg_value_locf"] == 15.0  # carried forward across the gap
    assert x2["avg_value_locf"] == 7.0
    y0, y1 = rows[("y", 0)], rows[("y", 1)]
    assert y0["is_gap"] and y0["avg_value_locf"] is None  # before first obs
    assert y1["avg_value_locf"] == 5.0
    with pytest.raises(ValueError, match="bucket"):
        resample_events(events, bucket="minute")


def test_event_funnel_requires_stage_order(spark):
    # u1 full ordered funnel; u2 purchase BEFORE view (stage 3 not reached);
    # u3 never signs up (excluded from stage 1 onward)
    events = spark.createDataFrame(
        [
            (1, _ts(0), 1, "signup", 0.0, ""),
            (2, _ts(10), 1, "view", 0.0, ""),
            (3, _ts(20), 1, "purchase", 0.0, ""),
            (4, _ts(0), 2, "signup", 0.0, ""),
            (5, _ts(5), 2, "purchase", 0.0, ""),
            (6, _ts(10), 2, "view", 0.0, ""),
            (7, _ts(0), 3, "view", 0.0, ""),
            (8, _ts(1), 3, "purchase", 0.0, ""),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["stage"]: (r["stage_idx"], r["n_users"], r["conversion_rate"])
        for r in event_funnel(events, ["signup", "view", "purchase"]).collect()
    }
    assert got["signup"] == (1, 2, None)
    assert got["view"] == (2, 2, 1.0)
    assert got["purchase"] == (3, 1, 0.5)
    with pytest.raises(ValueError, match="non-empty"):
        event_funnel(events, [])


def test_ranged_join_aggregates_match_bruteforce(spark):
    """sum/min/max over in-range rows only — out-of-range candidates from
    the same bucket must be masked out of the aggregates."""
    import datetime as dt

    d = dt.datetime
    ldf = spark.createDataFrame(
        [(1, d(2024, 1, 1, 12, 0, 0)), (2, d(2024, 1, 1, 12, 0, 0))],
        "k long, ts timestamp",
    )
    rows = [
        (1, d(2024, 1, 1, 11, 59, 30), 10.0),  # in range [-60, 0)
        (1, d(2024, 1, 1, 11, 59, 59), 5.0),   # in range
        (1, d(2024, 1, 1, 12, 0, 0), 100.0),   # boundary: excluded
        (1, d(2024, 1, 1, 11, 58, 0), 77.0),   # same bucket, out of range
        (2, d(2024, 1, 1, 11, 30, 0), 3.0),    # out of range
    ]
    rdf = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = {
        r["k"]: r
        for r in ranged_count_join(
            ldf, rdf, ["k"], "ts", "ts", -60, 0,
            counts={"n": None},
            carry_right=("v",),
            aggregates={
                "sum_v": F.coalesce(F.sum("r_v"), F.lit(0.0)),
                "min_v": F.min("r_v"),
                "max_v": F.max("r_v"),
            },
        ).collect()
    }
    assert (got[1]["n"], got[1]["sum_v"], got[1]["min_v"], got[1]["max_v"]) == (
        2, 15.0, 5.0, 10.0,
    )
    # no in-range rows: count 0, null-skipping aggregates stay NULL/0
    assert (got[2]["n"], got[2]["sum_v"], got[2]["min_v"], got[2]["max_v"]) == (
        0, 0.0, None, None,
    )
    # the aggregate path keeps the bucketed-equi-join plan
    plan = (
        ranged_count_join(
            ldf, rdf, ["k"], "ts", "ts", -60, 0,
            carry_right=("v",),
            aggregates={"sum_v": F.sum("r_v")},
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_funnel_plan_is_single_shuffle_no_joins(spark):
    """r4 single-pass funnel: one user_id exchange total — the old
    per-stage cascade had |stages| shuffle joins against a shrinking
    frame. The only other exchange is the one-row global rollup."""
    from audit_star_spark.sources.testdata import load_table

    df = event_funnel(
        load_table(spark, "/root/testdata/sf0.001", "events"),
        ["signup", "view", "purchase"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan, node
    assert plan.count("events.parquet") == 1, plan


def test_retention_cohorts_offsets(spark):
    """u1 joins week 0, active weeks 0 and 2; u2 joins week 1, active
    week 1 only."""
    d = dt.datetime
    events = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 10), 1, "click", 0.0, ""),   # Mon wk0
            (2, d(2024, 1, 16, 10), 1, "click", 0.0, ""),  # wk2
            (3, d(2024, 1, 9, 10), 2, "view", 0.0, ""),    # wk1
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from audit_star_spark.analytics.timeseries import retention_cohorts

    got = {
        (r["cohort_week"].day, r["week_offset"]): r["n_users"]
        for r in retention_cohorts(events).collect()
    }
    assert got == {(1, 0): 1, (1, 2): 1, (8, 0): 1}


def test_rate_anomalies_flags_spike_and_dead_feed(spark):
    """25 calm hours at ~2 events then a 40-event spike -> flagged; a
    gap bucket after steady traffic is a negative-z candidate."""
    d = dt.datetime
    rows = []
    eid = 0
    for h in range(25):
        for k in range(2 + (h % 2)):  # 2-3 events/hour, nonzero variance
            rows.append((eid, d(2024, 1, 1, 0) + dt.timedelta(hours=h, minutes=k), 1, "click", 0.0, ""))
            eid += 1
    for k in range(40):  # spike in hour 25
        rows.append((eid, d(2024, 1, 2, 1, 0) + dt.timedelta(seconds=k), 1, "click", 0.0, ""))
        eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from audit_star_spark.analytics.timeseries import rate_anomalies

    out = {r["bucket"]: r for r in rate_anomalies(events).collect()}
    spike = out[d(2024, 1, 2, 1, 0)]
    assert spike["is_anomaly"] and spike["z_score"] > 3
    # early buckets with <3 trailing observations are never flagged
    first = out[d(2024, 1, 1, 0, 0)]
    assert first["z_score"] is None and not first["is_anomaly"]
