"""Bucketed-layout plan tests: the point of bucketing is the *absence* of
Exchange (and Sort) nodes, so these assert on executed plans, plus a
result-equality check against the unbucketed path."""

import pytest
from pyspark.sql import functions as F

from audit_star_spark.plans.bucketing import stage_log_bucketed, write_bucketed
from audit_star_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Broadcast would hide the exchange question entirely for these tiny
    test tables; force the shuffle-join path the layout is designed for."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cocolated_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders, "t_orders_b", "o_orderkey", 4, path=str(tmp_path / "o")
    )
    write_bucketed(
        lineitem, "t_lineitem_b", "l_orderkey", 4, path=str(tmp_path / "l")
    )
    j = spark.table("t_orders_b").join(
        spark.table("t_lineitem_b"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = _plan(j)
    assert "Exchange" not in plan, plan
    # same rows as the unbucketed join
    expected = orders.join(
        lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    ).count()
    assert j.count() == expected


def test_bucketed_log_window_needs_no_exchange_or_sort(spark, tmp_path, no_broadcast):
    """The reconstruction window (partitionBy pk, orderBy audit_id) must
    run straight off the bucketed+sorted scan — the Spark analogue of the
    reference's (primary_key, audit_id) btree (audit.go:836). The
    Exchange disappears from bucketing alone; the Sort additionally needs
    spark.sql.legacy.bucketedTableScan.outputOrdering (since SPARK-28595
    readers distrust bucket sort order by default because multi-file
    buckets break it — our writer guarantees one file per bucket)."""
    from pyspark.sql import Window

    from audit_star_spark.plans.logstore import cached_users_log

    log, live, spec = cached_users_log(spark, SF_DIR)
    staged = stage_log_bucketed(
        spark, log, table="t_log_b", n_buckets=4, path=str(tmp_path / "log")
    )
    w = (
        Window.partitionBy("primary_key")
        .orderBy("audit_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )

    def window_plan():
        df = staged.withColumn(
            "nb",
            F.first(F.element_at("before_change", "name"), ignorenulls=True).over(w),
        )
        return df, _plan(df)

    df, plan = window_plan()
    assert "Exchange" not in plan, plan
    assert df.count() == log.count()

    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        df, plan = window_plan()
        assert "Exchange" not in plan, plan
        assert "+- Sort" not in plan, plan
        assert df.count() == log.count()
    finally:
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
