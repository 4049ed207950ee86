"""SCD2 history build (operators/scd.py): interval algebra invariants,
tombstone closure, point-in-time slice equivalence, and the shared-shuffle
plan shape."""

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def _history(spark):
    from audit_star_spark.operators.scd import scd2_history
    from audit_star_spark.plans.logstore import cached_users_log

    log, live, spec = cached_users_log(spark, SF_DIR)
    return log, live, spec, scd2_history(log, live, spec)


def test_intervals_are_chained_and_single_current(spark):
    """Per key: versions ordered by valid_from chain exactly (each
    valid_to equals the next valid_from — half-open, no gaps, no
    overlaps), only the last version may be open, and at most one version
    is current."""
    _, _, _, hist = _history(spark)
    rows = hist.collect()
    by_pk = {}
    for r in rows:
        by_pk.setdefault(r["primary_key"], []).append(r)
    assert by_pk
    for pk, vs in by_pk.items():
        vs.sort(key=lambda r: r["version_audit_id"])
        assert sum(1 for v in vs if v["is_current"]) <= 1, pk
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] is not None, (pk, a)
            # a D event between two versions leaves a genuine gap (the row
            # did not exist); otherwise the chain is contiguous
            assert a["valid_to"] <= b["valid_from"], (pk, a, b)
        if vs[-1]["is_current"]:
            assert vs[-1]["valid_to"] is None


def test_current_versions_equal_latest_state(spark):
    """The is_current slice must equal the latest_state rebuild (modulo
    the interval columns) — same survivors, same values."""
    from audit_star_spark.operators.reconstruct import latest_state
    from audit_star_spark.plans.logstore import cached_users_log

    log, live, spec, hist = _history(spark)
    cur = {
        r["id"]: (r["etype"], r["k"], float(r["val"]))
        for r in hist.filter("is_current").collect()
    }
    plog, _, pspec = cached_users_log(spark, SF_DIR, payload=True)
    want = {
        r["id"]: (r["etype"], r["k"], float(r["val"]))
        for r in latest_state(plog, pspec).collect()
    }
    assert cur == want


def test_point_in_time_slice_matches_snapshot_reconstruction(spark):
    """scd2_at(t) — a plain interval filter — must return exactly the
    rows the windowed time-travel reconstruction computes for the same
    timestamp."""
    from audit_star_spark.operators.scd import scd2_at
    from audit_star_spark.queries_audit import TIME_TRAVEL_TS, q_time_travel

    _, _, _, hist = _history(spark)
    got = {
        r["id"]: (r["etype"], r["k"], float(r["val"]))
        for r in scd2_at(hist, TIME_TRAVEL_TS).collect()
    }
    want = {
        r["id"]: (r["etype"], r["k"], float(r["val"]))
        for r in q_time_travel(spark, SF_DIR).collect()
    }
    assert got == want


def test_tombstones_close_without_opening(spark):
    """Keys whose event stream contains a D: the version open at the D's
    timestamp must have valid_to == that timestamp, and no version may
    START at it (a delete closes, never opens)."""
    log, _, _, hist = _history(spark)
    dels = {
        (r["primary_key"], r["changed_at"])
        for r in log.filter("operation = 'D'")
        .select("primary_key", "changed_at")
        .collect()
    }
    assert dels, "test data should contain deletes"
    opened = {
        (r["primary_key"], r["valid_from"])
        for r in hist.select("primary_key", "valid_from").collect()
    }
    closed = {
        (r["primary_key"], r["valid_to"])
        for r in hist.filter("valid_to IS NOT NULL")
        .select("primary_key", "valid_to")
        .collect()
    }
    # no version opens at a delete; deletes with a preceding version close it
    assert not (dels & opened)
    assert dels & closed


def test_scd2_plan_shares_the_reconstruction_shuffle(spark):
    """The lead() window rides the SAME partitionBy(primary_key)
    orderBy(audit_id) sort as the reconstruction's next-before window:
    the log side of the plan must show exactly ONE hashpartitioning
    Exchange (plus the broadcast for the live join, which is not a
    shuffle)."""
    _, _, _, hist = _history(spark)
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastExchange" in plan  # live side broadcast, not shuffled
    assert plan.count("Window") >= 2  # reconstruction + lead stacked
