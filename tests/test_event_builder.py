"""Golden capture-path tests, transliterated from the reference suite
(/root/reference/audit/audit_test.go:115–221, table1 I/U/D/T sequence)."""

import decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from audit_star_spark.catalog import TableSpec
from audit_star_spark.operators.event_builder import build_audit_events

TABLE1 = TableSpec(
    schema="teststar",
    name="table1",
    columns=[
        ("id", T.IntegerType()),
        ("column2", T.StringType()),
        ("column3", T.DecimalType(8, 2)),
        ("updated_by", T.StringType()),
    ],
    primary_key="id",
)

FEED_SCHEMA = (
    "seq long, op string, before map<string,string>, after map<string,string>, "
    "changed_at timestamp"
)


def _img(id=None, column2=None, column3=None, updated_by=None):
    return {"id": id, "column2": column2, "column3": column3, "updated_by": updated_by}


@pytest.fixture(scope="module")
def table1_log(spark):
    """INSERT (1,'some value') -> UPDATE column2 -> DELETE -> TRUNCATE."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    rows = [
        Row(seq=1, op="I", before=None, after=_img("1", "some value"), changed_at=t),
        Row(
            seq=2,
            op="U",
            before=_img("1", "some value"),
            after=_img("1", "some other value"),
            changed_at=t,
        ),
        Row(
            seq=3,
            op="D",
            before=_img("1", "some other value"),
            after=None,
            changed_at=t,
        ),
        Row(seq=4, op="T", before=None, after=None, changed_at=t),
    ]
    feed = spark.createDataFrame(rows, FEED_SCHEMA)
    log = build_audit_events(feed, pk_col="id", order_by=["seq"], id_mode="window")
    return {r["audit_id"]: r.asDict() for r in log.collect()}


def test_insert_event(table1_log):
    # audit_test.go:115–137: op I, pk '1', no payloads
    e = table1_log[1]
    assert e["operation"] == "I"
    assert e["primary_key"] == "1"
    assert e["before_change"] is None and e["change"] is None


def test_update_event_stores_only_changed_columns(table1_log):
    # audit_test.go:139–165: before={"column2":"some value"},
    # change={"column2":"some other value"}
    e = table1_log[2]
    assert e["operation"] == "U"
    assert e["before_change"] == {"column2": "some value"}
    assert e["change"] == {"column2": "some other value"}
    assert e["primary_key"] == "1"


def test_delete_event_stores_full_old_row_with_nulls(table1_log):
    # audit_test.go:167–193: before = entire old row incl. NULL-valued keys
    e = table1_log[3]
    assert e["operation"] == "D"
    assert e["before_change"] == {
        "id": "1",
        "column2": "some other value",
        "column3": None,
        "updated_by": None,
    }
    assert e["change"] is None
    assert e["primary_key"] == "1"


def test_truncate_event_no_payload_no_pk(table1_log):
    # audit_test.go:195–221: op T, pk NULL, before/change NULL
    e = table1_log[4]
    assert e["operation"] == "T"
    assert e["primary_key"] is None
    assert e["before_change"] is None and e["change"] is None


def test_audit_ids_gapless_monotone(table1_log):
    assert sorted(table1_log) == [1, 2, 3, 4]


def test_compound_pk_degrades_to_null(spark):
    # audit_test.go:223–303: compound-PK tables log with NULL primary_key
    import datetime as dt

    feed = spark.createDataFrame(
        [Row(seq=1, op="I", before=None, after={"id": "1", "id2": "2"}, changed_at=dt.datetime(2024, 1, 1))],
        FEED_SCHEMA,
    )
    log = build_audit_events(feed, pk_col=None, order_by=["seq"], id_mode="window")
    assert log.collect()[0]["primary_key"] is None


def test_value_truncation_500_chars(spark):
    import datetime as dt

    long_val = "x" * 600
    feed = spark.createDataFrame(
        [
            Row(
                seq=1,
                op="U",
                before={"id": "1", "c": long_val},
                after={"id": "1", "c": "short"},
                changed_at=dt.datetime(2024, 1, 1),
            )
        ],
        FEED_SCHEMA,
    )
    e = build_audit_events(feed, pk_col="id", order_by=["seq"], id_mode="window").collect()[0]
    # before truncated at 500 (audit.go:889); change NOT truncated (:892)
    assert len(e["before_change"]["c"]) == 500
    assert e["change"]["c"] == "short"


def test_sparse_time_every_1000(spark):
    # audit_test.go:1082–1120: sparse_time appears within ~1000 events
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    feed = spark.createDataFrame(
        [Row(seq=i, op="I", before=None, after={"id": str(i)}, changed_at=t) for i in range(1, 1501)],
        FEED_SCHEMA,
    )
    log = build_audit_events(feed, pk_col="id", order_by=["seq"], id_mode="distributed")
    sparse = log.filter("sparse_time is not null").collect()
    assert [r["audit_id"] for r in sparse] == [1000]


def test_client_query_off_by_default_on_when_enabled(spark):
    """Mirrors the reference's log_client_query toggle
    (audit_test.go:753–811): off -> NULL even when the feed carries the
    query text; on -> captured and truncated to 1,000 chars
    (audit.go:930)."""
    import datetime as dt

    feed = spark.createDataFrame(
        [
            Row(
                seq=1,
                op="I",
                before=None,
                after=_img("1", "v"),
                changed_at=dt.datetime(2024, 1, 1),
                client_query="INSERT INTO t VALUES " + "x" * 2000,
            )
        ],
        FEED_SCHEMA + ", client_query string",
    )
    off = build_audit_events(feed, pk_col="id", order_by=["seq"], id_mode="window")
    assert off.collect()[0]["client_query"] is None

    on = build_audit_events(
        feed, pk_col="id", order_by=["seq"], id_mode="window", log_client_query=True
    )
    got = on.collect()[0]["client_query"]
    assert got.startswith("INSERT INTO t VALUES x") and len(got) == 1000


def test_changed_by_defaults_and_feed_override(spark):
    """changed_by falls back to the session default when the feed has no
    metadata column (the reference's current_setting default,
    audit_test.go:609–750) and passes the feed's value through when
    present."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    bare = spark.createDataFrame(
        [Row(seq=1, op="I", before=None, after=_img("1", "v"), changed_at=t)],
        FEED_SCHEMA,
    )
    assert (
        build_audit_events(bare, pk_col="id", order_by=["seq"], id_mode="window")
        .collect()[0]["changed_by"]
        == "default"
    )

    tagged = spark.createDataFrame(
        [
            Row(
                seq=1,
                op="I",
                before=None,
                after=_img("1", "v"),
                changed_at=t,
                changed_by="alice",
            )
        ],
        FEED_SCHEMA + ", changed_by string",
    )
    assert (
        build_audit_events(tagged, pk_col="id", order_by=["seq"], id_mode="window")
        .collect()[0]["changed_by"]
        == "alice"
    )


def test_changed_by_carried_on_every_operation(spark):
    """TestLoggingChangedBy{Insert,Update,Delete,Truncate}
    (audit_test.go:609-753): the session actor must land on ALL four
    operation kinds — truncate included, which carries no row images."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    feed = spark.createDataFrame(
        [
            Row(seq=1, op="I", before=None, after=_img("1", "v"), changed_at=t,
                changed_by="svc_writer"),
            Row(seq=2, op="U", before=_img("1", "v"), after=_img("1", "w"),
                changed_at=t, changed_by="svc_writer"),
            Row(seq=3, op="D", before=_img("1", "w"), after=None, changed_at=t,
                changed_by="svc_admin"),
            Row(seq=4, op="T", before=None, after=None, changed_at=t,
                changed_by="svc_admin"),
        ],
        FEED_SCHEMA + ", changed_by string",
    )
    log = build_audit_events(feed, pk_col="id", order_by=["seq"], id_mode="window")
    got = {r["operation"]: r["changed_by"] for r in log.collect()}
    assert got == {"I": "svc_writer", "U": "svc_writer", "D": "svc_admin", "T": "svc_admin"}
    # T rows carry no pk and no images (audit.go:915-917)
    t_row = [r for r in log.collect() if r["operation"] == "T"][0]
    assert t_row["primary_key"] is None and t_row["before_change"] is None
