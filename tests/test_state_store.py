"""LatestStateStore: the streaming-maintained live-table snapshot.

Invariants: (1) after a multi-batch ingest the snapshot equals the
batch-derived live table (cdc.users_live_table); (2) deletes drop keys and
TRUNCATE clears earlier rows; (3) a foreachBatch replay leaves the state
unchanged; (4) typed_state serves as the B3 live side."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from audit_star_spark.sources.cdc import USERS_SPEC, users_change_feed, users_live_table
from audit_star_spark.sources.testdata import load_table
from audit_star_spark.streaming.ingest import (
    FEED_SCHEMA,
    AuditIngest,
    LatestStateStore,
    typed_state,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def feed_dir(spark, tmp_path):
    feed = users_change_feed(load_table(spark, SF_DIR, "events"))
    path = str(tmp_path / "feed")
    feed.select(*[f.name for f in FEED_SCHEMA.fields]).repartition(4).write.parquet(path)
    return path


def _mk_ingest(spark, tmp_path, feed_dir, **kw):
    return AuditIngest(
        spark,
        source_dir=feed_dir,
        log_dir=str(tmp_path / "log"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        pk_col="id",
        state_dir=str(tmp_path / "state"),
        **kw,
    )


def test_streamed_state_matches_batch_live_table(spark, tmp_path, feed_dir):
    ingest = _mk_ingest(spark, tmp_path, feed_dir, max_files_per_trigger=1)
    ingest.start(available_now=True).awaitTermination()
    got = typed_state(ingest.latest_state(), USERS_SPEC)
    expected = users_live_table(load_table(spark, SF_DIR, "events")).select(
        *[F.col(c).cast(t) for c, t in USERS_SPEC.columns]
    )
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_replayed_batch_leaves_state_unchanged(spark, tmp_path, feed_dir):
    ingest = _mk_ingest(spark, tmp_path, feed_dir)
    ingest.start(available_now=True).awaitTermination()
    version = ingest.state_store.current_version()
    rows_before = sorted(
        (r["primary_key"], r["last_event_id"])
        for r in ingest.latest_state().collect()
    )
    batch = spark.read.schema(FEED_SCHEMA).parquet(feed_dir)
    ingest._append_batch(batch, 0)  # simulated failure-recovery replay
    assert ingest.state_store.current_version() == version
    rows_after = sorted(
        (r["primary_key"], r["last_event_id"])
        for r in ingest.latest_state().collect()
    )
    assert rows_after == rows_before


def _feed_row(event_id, op, before, after):
    return (
        event_id,
        op,
        before,
        after,
        dt.datetime(2024, 1, 1) + dt.timedelta(seconds=event_id),
        "agent_0",
        "svc_0",
        "10.0.0.1",
        5000,
    )


def test_delete_and_truncate_semantics(spark, tmp_path):
    store = LatestStateStore(str(tmp_path / "state"))
    b1 = spark.createDataFrame(
        [
            _feed_row(1, "I", None, {"id": "1", "v": "a"}),
            _feed_row(2, "I", None, {"id": "2", "v": "b"}),
            _feed_row(3, "U", {"id": "1", "v": "a"}, {"id": "1", "v": "a2"}),
        ],
        FEED_SCHEMA,
    )
    store.apply_batch(spark, b1, 0, "id")
    s1 = {r["primary_key"]: r["row"]["v"] for r in store.read(spark).collect()}
    assert s1 == {"1": "a2", "2": "b"}
    # delete 2, truncate, then insert 3 after the truncate
    b2 = spark.createDataFrame(
        [
            _feed_row(4, "D", {"id": "2", "v": "b"}, None),
            _feed_row(5, "T", None, None),
            _feed_row(6, "I", None, {"id": "3", "v": "c"}),
        ],
        FEED_SCHEMA,
    )
    store.apply_batch(spark, b2, 1, "id")
    s2 = {r["primary_key"]: r["row"]["v"] for r in store.read(spark).collect()}
    assert s2 == {"3": "c"}  # 1 truncated, 2 deleted, 3 survives


def test_out_of_order_batches_do_not_resurrect(spark, tmp_path):
    """File-source micro-batches are not event-ordered: a batch carrying
    OLDER events can arrive after the batch holding a key's delete. The
    tombstone must win (no resurrection), and live keys must keep their
    newest image regardless of arrival order."""
    store = LatestStateStore(str(tmp_path / "state"))
    newer = spark.createDataFrame(
        [
            _feed_row(20, "D", {"id": "1", "v": "dead"}, None),
            _feed_row(21, "I", None, {"id": "2", "v": "new"}),
        ],
        FEED_SCHEMA,
    )
    older = spark.createDataFrame(
        [
            _feed_row(3, "I", None, {"id": "1", "v": "zombie"}),
            _feed_row(2, "I", None, {"id": "2", "v": "old"}),
        ],
        FEED_SCHEMA,
    )
    store.apply_batch(spark, newer, 0, "id")
    store.apply_batch(spark, older, 1, "id")
    state = {r["primary_key"]: r["row"]["v"] for r in store.read(spark).collect()}
    assert state == {"2": "new"}  # 1 stays deleted; 2 keeps the newer image


def test_state_serves_reconstruction_live_side(spark, tmp_path, feed_dir):
    """Close the loop: snapshot view built with the STREAMED live side must
    agree with one built from the batch-derived live table."""
    from audit_star_spark.operators.event_builder import build_audit_events
    from audit_star_spark.operators.reconstruct import snapshot_view

    ingest = _mk_ingest(spark, tmp_path, feed_dir)
    ingest.start(available_now=True).awaitTermination()
    feed = spark.read.schema(FEED_SCHEMA).parquet(feed_dir)
    log = build_audit_events(feed, pk_col="id", order_by=["event_id"])
    live_streamed = typed_state(ingest.latest_state(), USERS_SPEC)
    live_batch = users_live_table(load_table(spark, SF_DIR, "events"))
    a = snapshot_view(log, live_streamed, USERS_SPEC).select("audit_id", "id", "etype", "k", "val")
    b = snapshot_view(log, live_batch, USERS_SPEC).select("audit_id", "id", "etype", "k", "val")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
