"""StreamingSCD2: streamed store must equal the batch scd2_history over
the same payload log, across multi-batch ingest, replay, late-arriving
batches, and compaction."""

import pytest
from pyspark.sql import functions as F

from audit_star_spark.operators.scd import scd2_history
from audit_star_spark.plans.logstore import cached_users_log
from audit_star_spark.streaming.scd import StreamingSCD2
from tests.conftest import SF_DIR


@pytest.fixture()
def payload_log(spark):
    log, _, spec = cached_users_log(spark, SF_DIR, payload=True)
    return log, spec


@pytest.fixture()
def log_dir(spark, tmp_path, payload_log):
    log, spec = payload_log
    path = str(tmp_path / "log")
    log.select(
        "audit_id",
        "primary_key",
        "changed_at",
        "operation",
        "change",
        "before_change",
    ).repartition(4).write.parquet(path)
    return path


def _expected(spark, payload_log):
    log, spec = payload_log
    return scd2_history(log, None, spec)


def _assert_same(got, want):
    g = got.select(sorted(got.columns))
    w = want.select(sorted(want.columns))
    assert g.count() == w.count()
    assert g.exceptAll(w).count() == 0
    assert w.exceptAll(g).count() == 0


def test_streamed_scd2_equals_batch_multi_batch(
    spark, tmp_path, payload_log, log_dir
):
    _, spec = payload_log
    store = StreamingSCD2(str(tmp_path / "scd"), spec)
    stream = (
        spark.readStream.schema(spark.read.parquet(log_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(log_dir)
    )
    store.ingest(stream, str(tmp_path / "ckpt")).awaitTermination()
    _assert_same(store.read(spark), _expected(spark, payload_log))


def test_replayed_batch_is_idempotent(spark, tmp_path, payload_log):
    log, spec = payload_log
    store = StreamingSCD2(str(tmp_path / "scd"), spec)
    b0 = log.filter(F.col("audit_id") % 2 == 0)
    b1 = log.filter(F.col("audit_id") % 2 == 1)
    store.apply_batch(b0, 0)
    store.apply_batch(b1, 1)
    before = sorted(map(tuple, store.read(spark).collect()))
    store.apply_batch(b1, 1)  # replay: data landed, commit lost
    after = sorted(map(tuple, store.read(spark).collect()))
    assert before == after
    _assert_same(store.read(spark), _expected(spark, payload_log))


def test_out_of_order_batches_converge(spark, tmp_path, payload_log):
    """Later batch carries EARLIER events (file-listing order is
    arbitrary): the derived intervals must still equal the batch
    operator's."""
    log, spec = payload_log
    store = StreamingSCD2(str(tmp_path / "scd"), spec)
    hi = log.filter(F.col("audit_id") > 5000)
    lo = log.filter(F.col("audit_id") <= 5000)
    store.apply_batch(hi, 0)  # newest first
    store.apply_batch(lo, 1)
    _assert_same(store.read(spark), _expected(spark, payload_log))


def test_compaction_preserves_state_and_merges_new_batches(
    spark, tmp_path, payload_log
):
    log, spec = payload_log
    store = StreamingSCD2(str(tmp_path / "scd"), spec)
    store.apply_batch(log.filter(F.col("audit_id") % 3 == 0), 0)
    store.apply_batch(log.filter(F.col("audit_id") % 3 == 1), 1)
    store.compact(spark)
    # post-compaction ingest still merges correctly
    store.apply_batch(log.filter(F.col("audit_id") % 3 == 2), 2)
    _assert_same(store.read(spark), _expected(spark, payload_log))
    # exactly one baseline + one live partition remain
    import os

    parts = {
        p for p in os.listdir(store.store_path) if p.startswith("ingest_")
    }
    assert parts == {"ingest_batch_id=-1", "ingest_batch_id=2"}


def test_tombstones_survive_ingest_order(spark, tmp_path, payload_log):
    """A delete arriving BEFORE its key's earlier events (batch skew)
    must still close the interval chain — keys whose last event is D
    have no current version."""
    log, spec = payload_log
    dels = log.filter(F.col("operation") == "D")
    assert dels.count() > 0
    store = StreamingSCD2(str(tmp_path / "scd"), spec)
    store.apply_batch(dels, 0)  # deletes first
    store.apply_batch(log.filter(F.col("operation") != "D"), 1)
    got = store.read(spark)
    # per-pk: if the max audit_id event is a D, no current version
    last = log.groupBy("primary_key").agg(
        F.max_by("operation", "audit_id").alias("last_op")
    )
    dead = {r["primary_key"] for r in last.filter("last_op = 'D'").collect()}
    cur = {r["primary_key"] for r in got.filter("is_current").collect()}
    assert dead and not (dead & cur)
    _assert_same(got, _expected(spark, payload_log))


def test_read_plan_is_single_pk_exchange(spark, tmp_path, payload_log):
    log, spec = payload_log
    store = StreamingSCD2(str(tmp_path / "scd"), spec)
    store.apply_batch(log, 0)
    plan = store.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Python" not in plan, plan
