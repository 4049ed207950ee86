"""A12 active append-only enforcement: the Spark analog of the reference's
``no_dml_on_audit_table`` constraint triggers (audit.go:627-645, installed
per audit table at :796-806) — any UPDATE / DELETE / TRUNCATE evidence on
the log directory makes the next write RAISE instead of extending a
corrupted log. Plus updated_by provisioning parity (audit.go:431, 648-674)."""

import os

import pytest
from pyspark.sql import functions as F

from audit_star_spark.catalog import EngineConfig, TableSpec, ensure_updated_by
from audit_star_spark.plans.append_guard import AppendOnlyGuard, AppendOnlyViolation
from audit_star_spark.sources.cdc import users_change_feed
from audit_star_spark.sources.testdata import load_table
from audit_star_spark.streaming.ingest import FEED_SCHEMA, AuditIngest
from tests.conftest import SF_DIR


@pytest.fixture()
def feed_dir(spark, tmp_path):
    feed = users_change_feed(load_table(spark, SF_DIR, "events"))
    path = str(tmp_path / "feed")
    feed.select(*[f.name for f in FEED_SCHEMA.fields]).limit(200).repartition(2).write.parquet(path)
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


def _data_files(log_dir):
    out = []
    for root, _d, files in os.walk(log_dir):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return sorted(out)


def test_normal_appends_pass_guard(spark, tmp_path, feed_dir):
    ingest = _mk_ingest(spark, tmp_path, feed_dir, max_files_per_trigger=1)
    ingest.start(available_now=True).awaitTermination()
    assert ingest.log().count() == 200
    # manifest recorded; a fresh verify is clean
    AppendOnlyGuard(str(tmp_path / "log")).verify()


def test_delete_rejected(spark, tmp_path, feed_dir):
    """DELETE path: removing a committed log file must make the next
    micro-batch write raise (trigger: RAISE EXCEPTION 'No common-case
    updates/deletes/truncates allowed on audit table')."""
    ingest = _mk_ingest(spark, tmp_path, feed_dir)
    ingest.start(available_now=True).awaitTermination()
    os.remove(_data_files(str(tmp_path / "log"))[0])
    batch = spark.read.schema(FEED_SCHEMA).parquet(feed_dir)
    with pytest.raises(AppendOnlyViolation, match="No common-case"):
        ingest._append_batch(batch, 99)


def test_update_rejected(spark, tmp_path, feed_dir):
    """UPDATE path: a rewritten (size-changed) log file is DML evidence."""
    ingest = _mk_ingest(spark, tmp_path, feed_dir)
    ingest.start(available_now=True).awaitTermination()
    victim = _data_files(str(tmp_path / "log"))[0]
    with open(victim, "ab") as f:
        f.write(b"tampered")
    batch = spark.read.schema(FEED_SCHEMA).parquet(feed_dir)
    with pytest.raises(AppendOnlyViolation):
        ingest._append_batch(batch, 99)


def test_replay_of_own_batch_still_allowed(spark, tmp_path, feed_dir):
    """Idempotent replay rewrites exactly its own __batch dir — sanctioned,
    must NOT trip the guard (failure-recovery path)."""
    ingest = _mk_ingest(spark, tmp_path, feed_dir)
    ingest.start(available_now=True).awaitTermination()
    before = ingest.log().count()
    batch = spark.read.schema(FEED_SCHEMA).parquet(feed_dir)
    ingest._append_batch(batch, 0)  # replay batch 0
    assert ingest.log().count() == before


def test_compaction_rebaselines_guard(spark, tmp_path, feed_dir):
    """compact_log is sanctioned maintenance: it rewrites the layout and
    re-baselines the manifest, so ingest can continue afterwards."""
    from audit_star_spark.plans.logstore import compact_log

    ingest = _mk_ingest(spark, tmp_path, feed_dir, max_files_per_trigger=1)
    ingest.start(available_now=True).awaitTermination()
    n = compact_log(spark, str(tmp_path / "log"))
    assert n == 200
    AppendOnlyGuard(str(tmp_path / "log")).verify()  # clean after reset


# -- updated_by provisioning parity -----------------------------------------


def test_ensure_updated_by_added_and_idempotent():
    from pyspark.sql import types as T

    spec = TableSpec("app", "users", [("id", T.IntegerType())], "id")
    got = ensure_updated_by(spec)
    assert got.column_names == ["id", "updated_by"]
    # duplicate_column no-op (audit.go:660-663)
    again = ensure_updated_by(got)
    assert again.column_names == ["id", "updated_by"]


def test_provisioned_views_expose_updated_by(spark, tmp_path, feed_dir):
    """End-to-end: provision a table whose spec and live side lack
    updated_by; the registered views must still expose it (typed NULL),
    exactly the state ALTER TABLE ADD COLUMN leaves."""
    from pyspark.sql import types as T

    from audit_star_spark.provision import AuditStar

    spec = TableSpec(
        "app", "users",
        [("id", T.IntegerType()), ("name", T.StringType()), ("email", T.StringType()),
         ("plan", T.StringType()), ("mrr_cents", T.LongType()), ("country", T.StringType())],
        "id",
    )
    cfg = EngineConfig(
        log_root=str(tmp_path / "logs"), checkpoint_root=str(tmp_path / "ckpts")
    )
    star = AuditStar(spark, cfg)
    report = star.provision([spec], feeds={spec.fqn: feed_dir})
    assert report.audited == [spec.fqn] and not report.errors
    snap = spark.table("app_audit_users_audit_snapshot")
    assert "updated_by" in snap.columns
    assert snap.filter(F.col("updated_by").isNotNull()).count() == 0
