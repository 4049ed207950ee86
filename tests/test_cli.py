"""Provisioning CLI (EP1): YAML config -> provision run -> report, driven
through the same entry `python -m audit_star_spark` uses (main() called
in-process so the test reuses the session-scoped SparkSession)."""

import textwrap

from audit_star_spark.catalog import EngineConfig
from audit_star_spark.__main__ import main, specs_from_config
from audit_star_spark.sources.cdc import users_change_feed, users_live_table
from audit_star_spark.sources.testdata import load_table
from audit_star_spark.streaming.ingest import FEED_SCHEMA
from tests.conftest import SF_DIR


def test_cli_provisions_from_yaml(spark, tmp_path, capsys):
    events = load_table(spark, SF_DIR, "events")
    feed_path = str(tmp_path / "feed")
    users_change_feed(events).select(
        *[f.name for f in FEED_SCHEMA.fields]
    ).coalesce(1).write.parquet(feed_path)
    live_path = str(tmp_path / "live")
    users_live_table(events).write.parquet(live_path)

    cfg = tmp_path / "audit.yml"
    cfg.write_text(
        textwrap.dedent(
            f"""
            log_root: {tmp_path / "logs"}
            checkpoint_root: {tmp_path / "ckpts"}
            tables:
              app.users:
                primary_key: id
                columns:
                  id: bigint
                  etype: text
                  k: integer
                  val: numeric(10,2)
                feed: {feed_path}
                live: {live_path}
              app.nokey:
                columns:
                  a: integer
            """
        )
    )
    # main() builds its own session via get_spark, which returns the
    # already-active one in tests
    rc = main(["-cfg", str(cfg)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "audited   app.users" in out
    assert "skipped   app.nokey" in out

    delta = spark.sql(
        "SELECT * FROM app_audit_users_audit_delta WHERE audited_operation = 'U'"
    )
    assert delta.count() > 0
    # typed reconstruction came through the CLI-declared numeric(10,2)
    assert dict(delta.dtypes)["new_val"] == "decimal(10,2)"


def test_table_flag_narrows_to_one_table(tmp_path):
    cfg = EngineConfig(tables={"a.t1": {"primary_key": "id", "columns": {"id": "bigint"}},
                               "a.t2": {"primary_key": "id", "columns": {"id": "bigint"}}})
    cfg.included_tables = ["a.t1"]
    specs, _, _ = specs_from_config(cfg)
    kept = [s.fqn for s in cfg.filter_tables(specs)]
    assert kept == ["a.t1"]


def test_internal_schemas_never_audited():
    """getAllSchemas exclusions (audit.go:218-224) + TestInternalPostgres-
    Schemas / TestAuditPgs (audit_test.go:1038-1080): pg_* and audit
    schemas are never audited even without explicit exclusion; 'pgs' is."""
    cfg = EngineConfig()
    assert not cfg.table_included("pg_catalog", "pg_class")
    assert not cfg.table_included("pg_toast", "t1")
    assert not cfg.table_included("information_schema", "tables")
    assert not cfg.table_included("teststar_audit", "table1_audit")
    assert cfg.table_included("pgs", "table1")
    assert cfg.table_included("public", "users")


def test_security_mode_validated():
    """TestSecurityDefinerDefault / TestSecurityInvoker
    (audit_test.go:974-1037): both modes parse; anything else is rejected
    at config load (the reference would emit broken DDL)."""
    import pytest

    assert EngineConfig().security == "definer"
    assert EngineConfig(security="invoker").security == "invoker"
    with pytest.raises(ValueError, match="security"):
        EngineConfig(security="dictator")
    with pytest.raises(ValueError, match="lock_timeout"):
        EngineConfig(lock_timeout=0)


def test_owner_filtering():
    """TestAuditTablesOwner{Specified,NotSpecified} + SchemaNotOwnedBy-
    ConfigOwner (audit_test.go:1255-1364): with owner configured, only
    that role's tables are audited; unset audits everything; quoted
    owners are plain strings; unknown-owner specs stay auditable (our
    catalog is declared, not reflected)."""
    from pyspark.sql import types as T

    from audit_star_spark.catalog import TableSpec

    mk = lambda name, owner: TableSpec(
        "teststar", name, [("id", T.IntegerType())], "id", owner
    )
    specs = [
        mk("t_owned", "test__owner"),
        mk("t_other", "not_test__owner"),
        mk("t_quoted", "7357:owner"),
        mk("t_unknown", None),
    ]
    names = lambda cfg: [s.name for s in cfg.filter_tables(specs)]
    assert names(EngineConfig()) == ["t_owned", "t_other", "t_quoted", "t_unknown"]
    assert names(EngineConfig(owner="test__owner")) == ["t_owned", "t_unknown"]
    assert names(EngineConfig(owner="7357:owner")) == ["t_quoted", "t_unknown"]


def test_layout_cli_stats_and_zorder(tmp_path, capsys, spark):
    from audit_star_spark.__main__ import main
    from audit_star_spark.sources.testdata import load_table

    src = str(tmp_path / "src")
    load_table(spark, "/root/testdata/sf0.001", "region").write.parquet(src)
    rc = main(["layout", "stats", "--path", src, "--master", "local[2]"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "r_regionkey" in out and "row_group" in out
    dst = str(tmp_path / "dst")
    rc = main(
        [
            "layout", "zorder", "--in", src, "--out", dst,
            "--by", "r_regionkey", "--files", "1", "--master", "local[2]",
        ]
    )
    assert rc == 0
    assert spark.read.parquet(dst).count() == 5


def test_index_cli_build_and_probe(tmp_path, capsys, spark):
    from audit_star_spark.__main__ import main
    from tests.conftest import SF_DIR

    emb = f"{SF_DIR}/embeddings.parquet"
    idx = str(tmp_path / "idx")
    rc = main(
        [
            "index", "build", "--embeddings", emb, "--out", idx,
            "--cells", "8", "--iters", "1", "--master", "local[4]",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "n_cells" in out and "n_vectors" in out
    rc = main(
        [
            "index", "probe", "--index", idx, "--embeddings", emb,
            "--queries", "0,1", "-k", "3", "--master", "local[4]",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    # two queries x 3 ranked rows; rank-1 is the self-match (cosine 1)
    assert out.count("|1      ") >= 2 or "query_id" in out


def test_index_cli_pq_rerank_probe(tmp_path, capsys, spark):
    from audit_star_spark.__main__ import main
    from tests.conftest import SF_DIR

    emb = f"{SF_DIR}/embeddings.parquet"
    idx = str(tmp_path / "idx")
    assert main(
        [
            "index", "build", "--embeddings", emb, "--out", idx,
            "--cells", "8", "--iters", "1", "--pq", "--master", "local[4]",
        ]
    ) == 0
    capsys.readouterr()
    assert main(
        [
            "index", "probe", "--index", idx, "--embeddings", emb,
            "--queries", "0", "-k", "3", "--rerank", "10",
            "--master", "local[4]",
        ]
    ) == 0
    out = capsys.readouterr().out
    # re-rank outputs exact cosine: the self-match leads at cosine 1.0
    assert "cosine" in out and "1.0" in out


def test_diff_cli_smoke(tmp_path, capsys, spark):
    from audit_star_spark.__main__ import main

    old = str(tmp_path / "old.parquet")
    new = str(tmp_path / "new.parquet")
    spark.createDataFrame(
        [(1, "a b", "web"), (2, "c d", "web")],
        "doc_id long, text string, source string",
    ).write.parquet(old)
    spark.createDataFrame(
        [(1, "a b", "web"), (3, "e f", "web")],
        "doc_id long, text string, source string",
    ).write.parquet(new)
    assert main(["diff", old, new, "--master", "local[4]"]) == 0
    out = capsys.readouterr().out
    assert "n_added" in out and "web" in out
