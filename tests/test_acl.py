"""C11 grants (audit.go:720-745, 1115-1121): grant metadata recorded at
view registration when a grantee is configured, introspectable via
grants(), enforced at the engine's own access point read_view();
no grantee -> no rows and open access, like the reference's
``if grantee != ""`` guard."""

import pytest
from pyspark.sql import functions as F

from audit_star_spark.catalog import EngineConfig
from audit_star_spark.sources.cdc import users_change_feed
from audit_star_spark.streaming.ingest import FEED_SCHEMA
from audit_star_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def feed_dir(spark, tmp_path):
    feed = users_change_feed(load_table(spark, SF_DIR, "events"))
    path = str(tmp_path / "feed")
    feed.select(*[f.name for f in FEED_SCHEMA.fields]).repartition(2).write.parquet(path)
    return path


def _provision(spark, tmp_path, feed_dir, **cfg_kw):
    from audit_star_spark.provision import AuditStar
    from audit_star_spark.sources.cdc import USERS_SPEC

    cfg = EngineConfig(
        log_root=str(tmp_path / "logs"),
        checkpoint_root=str(tmp_path / "ckpts"),
        **cfg_kw,
    )
    star = AuditStar(spark, cfg)
    report = star.provision([USERS_SPEC], feeds={USERS_SPEC.fqn: feed_dir})
    assert report.audited == [USERS_SPEC.fqn] and not report.errors
    return star


def test_grants_recorded_and_enforced(spark, tmp_path, feed_dir):
    star = _provision(
        spark, tmp_path, feed_dir, grantee="analyst", owner="dba"
    )
    got = {
        (r["object_name"], r["object_type"], r["privilege"], r["grantee"])
        for r in star.grants().collect()
    }
    views = [
        f"app_audit_users_audit_{k}" for k in ("delta", "snapshot", "compare")
    ]
    # USAGE lands on the raw-log schema object, the exact name
    # grantUsageOnSchemas uses (audit.go:722: "%s_audit_raw")
    want = {("app_audit_raw", "schema", "USAGE", "analyst")} | {
        (v, "view", "SELECT", "analyst") for v in views
    }
    assert got == want
    # the grantee and the owner may read; an ungranted principal may not
    assert star.read_view(views[0], "analyst").count() > 0
    assert star.read_view(views[1], "dba").count() > 0
    with pytest.raises(PermissionError, match="intern"):
        star.read_view(views[0], "intern")
    with pytest.raises(PermissionError):
        star.read_view(views[2], None)


def test_no_grantee_means_open_access(spark, tmp_path, feed_dir):
    star = _provision(spark, tmp_path, feed_dir)
    assert star.grants().count() == 0
    # unguarded views are open to anyone, like the reference without -grantee
    assert star.read_view("app_audit_users_audit_delta", "anyone").count() > 0
    assert star.read_view("app_audit_users_audit_delta").count() > 0


def test_grants_idempotent_and_rehydrated(spark, tmp_path, feed_dir):
    from audit_star_spark.provision import AuditStar
    from audit_star_spark.sources.cdc import USERS_SPEC

    star = _provision(spark, tmp_path, feed_dir, grantee="analyst")
    n = star.grants().count()
    # views_only regeneration re-registers (C12) without duplicating rows
    report = star.provision([USERS_SPEC], views_only=True)
    assert report.audited == [USERS_SPEC.fqn]
    assert star.grants().count() == n
    # a FRESH engine over the same log_root extends, never clobbers
    cfg2 = EngineConfig(
        log_root=str(tmp_path / "logs"),
        checkpoint_root=str(tmp_path / "ckpts"),
        grantee="auditor",
    )
    star2 = AuditStar(spark, cfg2)
    report = star2.provision([USERS_SPEC], views_only=True)
    assert report.audited == [USERS_SPEC.fqn]
    grantees = {
        r["grantee"]
        for r in star2.grants().filter(F.col("privilege") == "SELECT").collect()
    }
    assert grantees == {"analyst", "auditor"}
    # enforcement sees BOTH grantees now
    assert star2.read_view("app_audit_users_audit_delta", "analyst").count() > 0
    assert star2.read_view("app_audit_users_audit_delta", "auditor").count() > 0
    with pytest.raises(PermissionError):
        star2.read_view("app_audit_users_audit_delta", "intern")


def test_sql_path_bypasses_enforcement_but_not_acl(spark, tmp_path, feed_dir):
    """The documented C11 boundary (_register_views docstring): OSS Spark
    has no authorization layer, so spark.sql over a registered temp view
    bypasses read_view enforcement. The bypass must not corrupt the
    recorded ACL — grants() is metadata, not a gate."""
    star = _provision(spark, tmp_path, feed_dir, grantee="analyst")
    before = {
        (r["object_name"], r["privilege"], r["grantee"])
        for r in star.grants().collect()
    }
    view = "app_audit_users_audit_delta"
    with pytest.raises(PermissionError):
        star.read_view(view, "intern")
    # same view, same (ungranted) caller, SQL surface: readable — the
    # enforcement point is read_view only
    assert spark.sql(f"SELECT count(*) AS n FROM {view}").collect()[0]["n"] > 0
    after = {
        (r["object_name"], r["privilege"], r["grantee"])
        for r in star.grants().collect()
    }
    assert after == before
