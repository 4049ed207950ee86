"""Streaming capture path: multi-batch ingest with gapless cross-batch
sequence, replay idempotence, and provisioning end-to-end (EP1+EP2)."""

import os

import pytest
from pyspark.sql import functions as F

from audit_star_spark.catalog import EngineConfig, TableSpec
from audit_star_spark.sources.cdc import users_change_feed
from audit_star_spark.sources.testdata import load_table
from audit_star_spark.streaming.ingest import FEED_SCHEMA, AuditIngest
from tests.conftest import SF_DIR


@pytest.fixture()
def feed_dir(spark, tmp_path):
    """The sf0.001 users change feed written as 4 parquet files so the
    stream processes multiple micro-batches."""
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
        **kw,
    )


def test_multi_batch_ingest_gapless_ids(spark, tmp_path, feed_dir):
    ingest = _mk_ingest(spark, tmp_path, feed_dir, max_files_per_trigger=1)
    ingest.start(available_now=True).awaitTermination()
    log = ingest.log()
    n = log.count()
    assert n == 1000
    ids = [r["audit_id"] for r in log.select("audit_id").orderBy("audit_id").collect()]
    assert ids == list(range(1, 1001))
    # multiple micro-batches actually happened
    batches = spark.read.parquet(str(tmp_path / "log")).select("__batch").distinct().count()
    assert batches >= 2


def test_replayed_batch_is_idempotent(spark, tmp_path, feed_dir):
    ingest = _mk_ingest(spark, tmp_path, feed_dir)
    ingest.start(available_now=True).awaitTermination()
    before = ingest.log().count()
    # simulate a foreachBatch replay of batch 0 (failure recovery path)
    batch = spark.read.schema(FEED_SCHEMA).parquet(feed_dir)
    ingest._append_batch(batch, 0)
    log = ingest.log()
    assert log.count() == before
    ids = [r["audit_id"] for r in log.select("audit_id").orderBy("audit_id").collect()]
    assert ids == list(range(1, before + 1))


def test_ingested_log_matches_batch_builder(spark, tmp_path, feed_dir):
    """Streaming capture must produce the same log as the batch builder
    (modulo micro-batch boundaries, which the ids erase)."""
    from audit_star_spark.functions.maps import canonical_diff_string
    from audit_star_spark.operators.event_builder import build_audit_events

    def flat(df):
        # set ops reject MapType columns — compare canonical renderings
        return df.select(
            "audit_id",
            "operation",
            "primary_key",
            canonical_diff_string(F.col("before_change")).alias("b"),
            canonical_diff_string(F.col("change")).alias("c"),
        )

    ingest = _mk_ingest(spark, tmp_path, feed_dir)
    ingest.start(available_now=True).awaitTermination()
    streamed = flat(ingest.log())
    feed = spark.read.schema(FEED_SCHEMA).parquet(feed_dir)
    batch = flat(build_audit_events(feed, pk_col="id", order_by=["event_id"]))
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_provision_end_to_end(spark, tmp_path, feed_dir):
    from audit_star_spark.provision import AuditStar
    from audit_star_spark.sources.cdc import USERS_SPEC, users_live_table

    cfg = EngineConfig(
        log_root=str(tmp_path / "logs"), checkpoint_root=str(tmp_path / "ckpts")
    )
    star = AuditStar(spark, cfg)
    live = users_live_table(load_table(spark, SF_DIR, "events"))
    compound = TableSpec("app", "nokey", [("a", "int"), ("b", "int")], None)  # type: ignore[list-item]
    report = star.provision(
        [USERS_SPEC, compound],
        feeds={USERS_SPEC.fqn: feed_dir},
        live={USERS_SPEC.fqn: live},
    )
    assert report.audited == [USERS_SPEC.fqn]
    assert report.skipped == [("app.nokey", "no single-column primary key")]
    assert not report.errors
    # views are registered and queryable through SQL (B8)
    n = spark.sql(
        "SELECT count(*) AS n FROM app_audit_users_audit_delta WHERE audited_operation = 'I'"
    ).collect()[0]["n"]
    assert n > 0
    # control table has an open interval (C10)
    hist = star.audit_history().collect()
    assert any(r["table_name"] == "users" and r["start_time"] is not None for r in hist)
    # disable closes the interval and stops capture (C9)
    star.disable(USERS_SPEC)
    hist2 = star.audit_history().collect()
    assert any(r["table_name"] == "users" and r["end_time"] is not None for r in hist2)


def test_provision_without_live_table_uses_streamed_state(spark, tmp_path, feed_dir):
    """Feed-only provisioning: with no caller-supplied live table, the B3
    side comes from the LatestStateStore snapshot and the views must agree
    with the ones built from the batch-derived live table."""
    from audit_star_spark.provision import AuditStar
    from audit_star_spark.sources.cdc import USERS_SPEC, users_live_table

    cfg = EngineConfig(
        log_root=str(tmp_path / "logs"), checkpoint_root=str(tmp_path / "ckpts")
    )
    star = AuditStar(spark, cfg)
    report = star.provision([USERS_SPEC], feeds={USERS_SPEC.fqn: feed_dir})
    assert report.audited == [USERS_SPEC.fqn] and not report.errors
    got = spark.sql(
        "SELECT audit_id, id, etype, k, val FROM app_audit_users_audit_snapshot"
    )
    from audit_star_spark.operators.reconstruct import snapshot_view

    live = users_live_table(load_table(spark, SF_DIR, "events"))
    want = snapshot_view(star.log_for(USERS_SPEC), live, USERS_SPEC).select(
        "audit_id", "id", "etype", "k", "val"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_excluded_table_not_provisioned(spark, tmp_path, feed_dir):
    from audit_star_spark.provision import AuditStar
    from audit_star_spark.sources.cdc import USERS_SPEC

    cfg = EngineConfig(
        log_root=str(tmp_path / "logs"),
        checkpoint_root=str(tmp_path / "ckpts"),
        excluded_tables=["app.users"],
    )
    report = AuditStar(spark, cfg).provision([USERS_SPEC], feeds={USERS_SPEC.fqn: feed_dir})
    assert report.audited == [] and not report.errors


def test_schema_evolution_capture_survives(spark, tmp_path):
    """The reference's headline property (docs/index.md:11): capture never
    breaks when columns are added/removed — diffs are schema-agnostic maps.
    Mirrors audit_test.go:530–607."""
    import datetime as dt

    from pyspark.sql import Row

    from audit_star_spark.catalog import TableSpec
    from audit_star_spark.operators.event_builder import build_audit_events
    from audit_star_spark.operators.reconstruct import delta_view
    from pyspark.sql import types as T

    t = dt.datetime(2024, 1, 1)
    rows = [
        Row(seq=1, op="I", before=None, after={"id": "1", "column2": "v"}, changed_at=t),
        # schema evolved: new_col appears mid-stream
        Row(
            seq=2,
            op="U",
            before={"id": "1", "column2": "v", "new_col": None},
            after={"id": "1", "column2": "v", "new_col": "x"},
            changed_at=t,
        ),
    ]
    feed = spark.createDataFrame(
        rows,
        "seq long, op string, before map<string,string>, after map<string,string>, changed_at timestamp",
    )
    log = build_audit_events(feed, pk_col="id", order_by=["seq"], id_mode="window")
    # capture recorded the new column without any reconfiguration
    u = [r for r in log.collect() if r["operation"] == "U"][0]
    assert u["change"] == {"new_col": "x"}
    # views regenerated with the evolved spec expose it
    spec2 = TableSpec(
        "s", "t",
        [("id", T.IntegerType()), ("column2", T.StringType()), ("new_col", T.StringType())],
        "id",
    )
    d = delta_view(log, None, spec2)
    row = [r for r in d.collect() if r["audited_operation"] == "U"][0]
    assert row["new_new_col"] == "x" and row["old_new_col"] is None


def test_streamed_live_side_survives_further_batches(spark, tmp_path, feed_dir):
    """ADVICE r01: registered views used to bind the concrete _state
    version dir current at registration; two further micro-batches plus
    KEEP_VERSIONS=2 GC deleted it and the views failed at query time.
    Views now re-register on every applied batch (ingest.on_batch) and pin
    the version they serve — so after N more batches the view must (a)
    still answer, (b) reflect the new events."""
    import datetime as dt

    from pyspark.sql import Row

    from audit_star_spark.provision import AuditStar
    from audit_star_spark.sources.cdc import USERS_SPEC

    cfg = EngineConfig(
        log_root=str(tmp_path / "logs"), checkpoint_root=str(tmp_path / "ckpts")
    )
    star = AuditStar(spark, cfg)
    report = star.provision([USERS_SPEC], feeds={USERS_SPEC.fqn: feed_dir})
    assert report.audited == [USERS_SPEC.fqn] and not report.errors
    ingest = star.ingests[USERS_SPEC.fqn]

    def extra_batch(batch_id, event_id, uid):
        rows = [
            Row(
                event_id=event_id, op="I", before=None,
                after={"id": str(uid), "etype": "signup", "k": None, "val": None},
                changed_at=dt.datetime(2025, 1, 1), changed_by=None,
                db_user=None, client_addr=None, client_port=None,
            )
        ]
        ingest._append_batch(spark.createDataFrame(rows, FEED_SCHEMA), batch_id)

    # three more applied batches: batch N+2's GC deletes the version the
    # views were first registered over (keep-2), and batch N+3's guard
    # walk must not mistake that state-store GC for log DML
    extra_batch(100, 10_000_001, 999_001)
    extra_batch(101, 10_000_002, 999_002)
    extra_batch(102, 10_000_003, 999_003)

    snap = spark.sql(
        "SELECT primary_key FROM app_audit_users_audit_snapshot "
        "WHERE primary_key IN ('999001', '999002', '999003')"
    )
    assert snap.count() == 3  # would raise FileNotFound before the fix


def test_continuous_trigger_ingest_with_live_views(spark, tmp_path, feed_dir):
    """The VERDICT r02 gap: the LatestStateStore GC + version pinning +
    view re-registration interplay was only ever exercised through direct
    ``_append_batch`` calls. Here the SAME ingest runs under a real
    continuous (processing-time) trigger: three feed files arrive while
    the stream is live, each processed by the streaming thread (which
    fires the on_batch re-registration callbacks), and the registered
    snapshot view is queried BETWEEN batches — across enough applied
    batches that KEEP_VERSIONS=2 GC has deleted the originally-bound
    state version."""
    import datetime as dt
    import time

    from pyspark.sql import Row

    from audit_star_spark.provision import AuditStar
    from audit_star_spark.sources.cdc import USERS_SPEC

    cfg = EngineConfig(
        log_root=str(tmp_path / "logs"), checkpoint_root=str(tmp_path / "ckpts")
    )
    star = AuditStar(spark, cfg)
    report = star.provision([USERS_SPEC], feeds={USERS_SPEC.fqn: feed_dir})
    assert report.audited == [USERS_SPEC.fqn] and not report.errors
    ingest = star.ingests[USERS_SPEC.fqn]
    base_count = ingest.log().count()

    def wait_for(cond, timeout=90.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if cond():
                return
            time.sleep(0.5)
        raise AssertionError("timed out waiting for micro-batch")

    query = ingest.start(available_now=False)
    try:
        for i, uid in enumerate((888_001, 888_002, 888_003)):
            rows = [
                Row(
                    event_id=20_000_000 + i, op="I", before=None,
                    after={"id": str(uid), "etype": "signup", "k": None, "val": None},
                    changed_at=dt.datetime(2025, 2, 1), changed_by=None,
                    db_user=None, client_addr=None, client_port=None,
                )
            ]
            spark.createDataFrame(rows, FEED_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(feed_dir)
            # query the view between live batches: it must re-resolve to a
            # non-GC'd state version and reflect this event once the
            # streaming thread's on_batch re-registration has run (the log
            # write lands BEFORE state apply + re-register, so the view —
            # not the log count — is the completion signal)
            def view_has_uid(uid=uid):
                return (
                    spark.sql(
                        "SELECT primary_key FROM app_audit_users_audit_snapshot "
                        f"WHERE primary_key = '{uid}'"
                    ).count()
                    == 1
                )

            wait_for(view_has_uid)
    finally:
        query.stop()
    # all three arrived through distinct streaming micro-batches
    assert ingest.log().count() == base_count + 3
