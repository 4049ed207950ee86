"""Log-only state reconstruction (the store_insert_payload upgrade):
latest_state over a payload-mode log must equal the independently derived
live table exactly — every column, every surviving key."""

from pyspark.sql import functions as F

from audit_star_spark.operators.event_builder import build_audit_events
from audit_star_spark.operators.reconstruct import latest_state
from audit_star_spark.sources.cdc import users_audit_inputs
from tests.conftest import SF_DIR


def test_latest_state_equals_live_table(spark):
    feed, live, spec = users_audit_inputs(spark, SF_DIR)
    log = build_audit_events(
        feed, pk_col="id", order_by=["event_id"], store_insert_payload=True
    )
    state = latest_state(log, spec)

    cols = [c for c, _ in spec.columns]
    a = state.select(*[F.col(c).alias(f"a_{c}") for c in cols])
    b = live.select(*[F.col(c).alias(f"b_{c}") for c in cols])
    j = a.join(b, a["a_id"] == b["b_id"], "full_outer")
    mism = j.filter(~F.expr(" AND ".join(f"a_{c} <=> b_{c}" for c in cols)))
    assert state.count() == live.count() > 0
    assert mism.count() == 0, mism.limit(5).collect()


def test_faithful_mode_still_stores_nothing_for_inserts(spark):
    feed, _, _ = users_audit_inputs(spark, SF_DIR)
    log = build_audit_events(feed, pk_col="id", order_by=["event_id"])
    assert log.filter((F.col("operation") == "I") & F.col("change").isNotNull()).count() == 0
