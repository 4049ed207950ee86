"""Quoted / special identifier support, mirroring the reference's dedicated
quoted-names fixtures (db/migrate/1496851823_audit_star.up.sql:95-131:
quoted column ":this_column", quoted table "table_:six", quoted PK "i:d",
quoted schema "test:star"; exercised by audit_test.go:1122-1228).

Spark has no DDL identifiers to quote, but ``F.col`` PARSES names (dots =
struct access, backticks = quoting), so spec-derived column names with
colons, spaces, dots, uppercase, or embedded backticks must round-trip the
full capture + reconstruction path unmangled. util.qcol is the load-bearing
helper; this module is the regression net."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from audit_star_spark.catalog import TableSpec
from audit_star_spark.operators.event_builder import build_audit_events
from audit_star_spark.operators.reconstruct import (
    compare_view,
    delta_view,
    latest_state,
    snapshot_view,
)
from audit_star_spark.util import qcol, safe_identifier

# one table concentrating every hostile shape the reference spreads over
# four fixtures: quoted PK ("i:d"), leading-colon column, spaces, dots,
# uppercase, and an embedded backtick (impossible in PG, worst case here)
QUOTED = TableSpec(
    schema="test:star",
    name="table_:six",
    columns=[
        ("i:d", T.IntegerType()),
        (":this_column", T.StringType()),
        ("weird col", T.StringType()),
        ("Upper.Case", T.StringType()),
        ("back`tick", T.StringType()),
    ],
    primary_key="i:d",
)

FEED_SCHEMA = (
    "seq long, op string, before map<string,string>, after map<string,string>, "
    "changed_at timestamp"
)
TS = dt.datetime(2024, 1, 1)


def _img(id=None, this=None, weird=None, upper=None, tick=None):
    return {
        "i:d": id,
        ":this_column": this,
        "weird col": weird,
        "Upper.Case": upper,
        "back`tick": tick,
    }


def _log(spark, ops, **kw):
    feed = spark.createDataFrame(
        [
            Row(seq=i + 1, op=op, before=b, after=a, changed_at=TS)
            for i, (op, b, a) in enumerate(ops)
        ],
        FEED_SCHEMA,
    )
    return build_audit_events(
        feed, pk_col="i:d", order_by=["seq"], id_mode="window", **kw
    )


OPS = [
    ("I", None, _img("1", "v1", "w1", "u1", "t1")),
    ("U", _img("1", "v1", "w1", "u1", "t1"), _img("1", "v2", "w1", "u1", "t1")),
    ("I", None, _img("2", "x1", "x2", "x3", "x4")),
    ("D", _img("2", "x1", "x2", "x3", "x4"), None),
]


@pytest.fixture(scope="module")
def live(spark):
    return spark.createDataFrame(
        [Row(**{"i:d": 1, ":this_column": "v2", "weird col": "w1",
                "Upper.Case": "u1", "back`tick": "t1"})],
        QUOTED.spark_schema(),
    )


def test_qcol_parses_hostile_names(spark):
    df = spark.createDataFrame([Row(**{"a.b": 1, "back`tick": 2, "c d": 3})])
    got = df.select(
        qcol("a.b").alias("x"), qcol("back`tick").alias("y"), qcol("c d").alias("z")
    ).first()
    assert (got.x, got.y, got.z) == (1, 2, 3)


def test_capture_quoted_pk(spark):
    log = _log(spark, OPS).orderBy("audit_id").collect()
    assert [r.primary_key for r in log] == ["1", "1", "2", "2"]
    # the U diff keys keep their exact names
    assert dict(log[1].change) == {":this_column": "v2"}
    assert dict(log[1].before_change) == {":this_column": "v1"}


def test_delta_quoted_columns(spark, live):
    log = _log(spark, OPS)
    d = delta_view(log, live, QUOTED)
    assert "new_:this_column" in d.columns and "old_Upper.Case" in d.columns
    u = d.filter(F.col("audited_operation") == "U").first()
    assert u["old_:this_column"] == "v1" and u["new_:this_column"] == "v2"
    # insert reconstructs via next-before / live without name mangling
    i1 = d.filter((F.col("audited_operation") == "I") & (F.col("primary_key") == "1")).first()
    assert i1["new_:this_column"] == "v1" and i1["new_back`tick"] == "t1"


def test_snapshot_and_compare_quoted_columns(spark, live):
    log = _log(spark, OPS)
    s = snapshot_view(log, live, QUOTED)
    rows = {(r["primary_key"], r["audit_id"]): r.asDict() for r in s.collect()}
    assert rows[("1", 1)][":this_column"] == "v1"
    assert rows[("1", 2)][":this_column"] == "v2"
    assert rows[("2", 3)]["weird col"] == "x2"
    c = compare_view(log, live, QUOTED)
    dele = c.filter(F.col("audited_operation") == "D").first()
    assert dele["old_:this_column"] == "x1" and dele["old_Upper.Case"] == "x3"


def test_latest_state_quoted_columns(spark):
    log = _log(spark, OPS, store_insert_payload=True)
    st = latest_state(log, QUOTED)
    rows = [r.asDict() for r in st.collect()]
    assert len(rows) == 1  # pk=2 deleted
    assert rows[0]["i:d"] == 1 and rows[0][":this_column"] == "v2"
    assert rows[0]["back`tick"] == "t1"


def test_view_registry_sanitizes_names():
    assert (
        safe_identifier("test:star_audit_table_:six_audit_delta")
        == "test_star_audit_table__six_audit_delta"
    )
