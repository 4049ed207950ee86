"""t-closeness (Li, Li & Venkatasubramanian 2007): batch census, plan
shape, and the streaming read off the k-anonymity count store."""

import pytest


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _tc(spark, rows):
    return spark.createDataFrame(rows, "q string, sv int")


# global domain {1, 2, 3}: counts 1->2, 2->1, 3->1, N=4, cum_q=(0.5, 0.75)
TC_ROWS = [
    ("A", 1),
    ("A", 1),
    ("A", 3),  # class A: cum_p = (2/3, 2/3) -> EMD = (1/6 + 1/12) / 2 = 0.125
    ("B", 2),  # class B: cum_p = (0, 1)     -> EMD = (1/2 + 1/4) / 2 = 0.375
]


def test_t_closeness_hand_emd(spark):
    from audit_star_spark.analytics.privacy import t_closeness_census

    got = {
        r["q"]: r
        for r in t_closeness_census(
            _tc(spark, TC_ROWS), ["q"], "sv", t=0.2
        ).collect()
    }
    a, b = got["A"], got["B"]
    assert a["class_size"] == 3 and b["class_size"] == 1
    assert a["emd6"] == 0.125 and a["violates_t"] is False
    assert b["emd6"] == 0.375 and b["violates_t"] is True


def test_t_closeness_degenerate_domain_and_validation(spark):
    from audit_star_spark.analytics.privacy import t_closeness_census

    # m == 1: every class matches the global distribution exactly
    one = _tc(spark, [("A", 7), ("A", 7), ("B", 7)])
    for r in t_closeness_census(one, ["q"], "sv", t=0.0).collect():
        assert r["emd6"] == 0.0 and r["violates_t"] is False
    with pytest.raises(ValueError):
        t_closeness_census(one, [], "sv")
    with pytest.raises(ValueError):
        t_closeness_census(one, ["q"], "sv", t=1.5)


def test_t_closeness_class_equal_to_global_has_zero_emd(spark):
    from audit_star_spark.analytics.privacy import t_closeness_census

    # two classes with IDENTICAL distributions: both EMD 0 even with m=2
    rows = [("A", 1), ("A", 2), ("B", 1), ("B", 2)]
    for r in t_closeness_census(_tc(spark, rows), ["q"], "sv").collect():
        assert r["emd6"] == 0.0


def test_t_closeness_plan_shape(spark):
    """Class-grid joins must broadcast the domain-bounded value frame
    and the count aggregate must partial map-side; the per-class cumsum
    window must be partitioned (the only unpartitioned window is over
    the <= m-row domain frame, the documented lm.py scalar shape)."""
    from audit_star_spark.analytics.privacy import t_closeness_census

    plan = (
        t_closeness_census(_tc(spark, TC_ROWS), ["q"], "sv")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Broadcast" in plan
    assert "partial" in plan.lower()


def test_streaming_t_closeness_parity_replay_compaction(spark, tmp_path):
    from audit_star_spark.analytics.privacy import t_closeness_census
    from audit_star_spark.streaming.privacy import StreamingKAnonymity

    st = StreamingKAnonymity(
        str(tmp_path / "priv"), ["q"], k=2, sensitive_col="sv"
    )
    assert st.t_closeness(spark) is None
    st.apply_batch(_tc(spark, TC_ROWS[:2]), 0)
    st.apply_batch(_tc(spark, TC_ROWS[2:]), 1)
    want = _rows(t_closeness_census(_tc(spark, TC_ROWS), ["q"], "sv", t=0.2))
    assert _rows(st.t_closeness(spark, t=0.2)) == want
    st.apply_batch(_tc(spark, TC_ROWS[2:]), 1)  # at-least-once replay
    assert _rows(st.t_closeness(spark, t=0.2)) == want
    st.compact(spark)
    assert _rows(st.t_closeness(spark, t=0.2)) == want
    # growth after compaction: a value arriving only later must reshape
    # the GLOBAL distribution for every class (corpus-relative, the
    # reason per-batch verdicts cannot freeze)
    later = [("A", 2), ("C", 3)]
    st.apply_batch(_tc(spark, later), 2)
    assert _rows(st.t_closeness(spark, t=0.2)) == _rows(
        t_closeness_census(_tc(spark, TC_ROWS + later), ["q"], "sv", t=0.2)
    )


def test_streaming_t_closeness_requires_sensitive(spark, tmp_path):
    from audit_star_spark.streaming.privacy import StreamingKAnonymity

    st = StreamingKAnonymity(str(tmp_path / "priv"), ["q"], k=2)
    with pytest.raises(ValueError):
        st.t_closeness(spark)
