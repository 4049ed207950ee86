"""Schema-evolution paths beyond the add-column happy case, mirroring
audit_test.go:530-607: type change (TestSchemaTypeChange), column rename
happy + invalid paths (TestSchemaNameChange), drop (TestDropColumns).

The engine's model: capture is schema-agnostic (map diffs), ALTER = a new
TableSpec + regenerated views. Each path asserts the reference's headline
property — capture never breaks; views regenerate and stay typed."""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from audit_star_spark.catalog import TableSpec
from audit_star_spark.operators.event_builder import build_audit_events
from audit_star_spark.operators.reconstruct import compare_view, delta_view, snapshot_view

FEED_SCHEMA = (
    "seq long, op string, before map<string,string>, after map<string,string>, "
    "changed_at timestamp"
)
TS = dt.datetime(2024, 1, 1)


def _spec(columns):
    return TableSpec("teststar", "table1", columns, "id")


BASE = _spec(
    [("id", T.IntegerType()), ("column2", T.StringType()), ("column3", T.DecimalType(8, 2))]
)


def _log(spark, ops):
    feed = spark.createDataFrame(
        [Row(seq=i + 1, op=op, before=b, after=a, changed_at=TS) for i, (op, b, a) in enumerate(ops)],
        FEED_SCHEMA,
    )
    return build_audit_events(feed, pk_col="id", order_by=["seq"], id_mode="window")


def test_type_change(spark):
    """TestSchemaTypeChange (audit_test.go:530-551): alter column3
    numeric(8,2) -> numeric(9,3), insert 9.5, read it back through the
    compare view as the NEW type. Stored map values are strings, so the
    regenerated view's cast is the only place the type lives."""
    ops = [("I", None, {"id": "4", "column2": None, "column3": "9.5"})]
    log = _log(spark, ops)
    live = spark.createDataFrame(
        [Row(id=4, column2=None, column3=Decimal("9.500"))],
        _spec([("id", T.IntegerType()), ("column2", T.StringType()),
               ("column3", T.DecimalType(9, 3))]).spark_schema(),
    )
    altered = _spec(
        [("id", T.IntegerType()), ("column2", T.StringType()), ("column3", T.DecimalType(9, 3))]
    )
    row = compare_view(log, live, altered).filter(F.col("primary_key") == "4").first()
    assert row["new_column3"] == Decimal("9.500")
    assert dict(snapshot_view(log, live, altered).schema["column3"].jsonValue())["type"] == "decimal(9,3)"


def test_rename_happy_path(spark):
    """TestSchemaNameChange happy path: rename column3 -> column4.
    Pre-rename audit rows keep the OLD key in their maps (exactly like the
    reference's hstore rows), so the renamed column reads NULL for old
    events and real values after the rename; capture itself never fails."""
    ops = [
        ("I", None, {"id": "1", "column2": "a", "column3": "1.00"}),
        # post-rename update: images now carry column4
        ("U", {"id": "1", "column2": "a", "column4": "1.00"},
              {"id": "1", "column2": "a", "column4": "2.00"}),
    ]
    log = _log(spark, ops)
    renamed = _spec(
        [("id", T.IntegerType()), ("column2", T.StringType()), ("column4", T.DecimalType(8, 2))]
    )
    d = delta_view(log, None, renamed)
    u = d.filter(F.col("audited_operation") == "U").first()
    assert u["old_column4"] == Decimal("1.00") and u["new_column4"] == Decimal("2.00")
    # the pre-rename insert reconstructs column4 via the U's before_change
    i = d.filter(F.col("audited_operation") == "I").first()
    assert i["new_column4"] == Decimal("1.00")
    # the old name is simply absent from the regenerated view
    assert "new_column3" not in d.columns


@pytest.mark.parametrize(
    "bad_columns",
    [
        # empty name (PG: rename to 1 / @# / 'column 4' all parse-fail;
        # Spark accepts those via qcol, so emptiness is the invalid shape)
        [("id", T.IntegerType()), ("", T.StringType())],
        # duplicate target name (rename onto an existing column)
        [("id", T.IntegerType()), ("column2", T.StringType()), ("column2", T.StringType())],
    ],
)
def test_rename_invalid_specs_rejected(bad_columns):
    """TestSchemaNameChange sad paths: the reference relies on PG to
    reject malformed identifiers; the engine's analog rejects specs that
    can never resolve (empty / duplicate names) at construction."""
    with pytest.raises(ValueError):
        _spec(bad_columns)


def test_drop_column(spark):
    """TestDropColumns (audit_test.go:595-607): drop column3, regenerate.
    Views lose the column; capture history still holds the dropped values
    in the maps (recoverable by re-adding the column to the spec)."""
    ops = [
        ("I", None, {"id": "1", "column2": "a", "column3": "5.00"}),
        ("U", {"id": "1", "column2": "a", "column3": "5.00"},
              {"id": "1", "column2": "b", "column3": "6.00"}),
    ]
    log = _log(spark, ops)
    dropped = _spec([("id", T.IntegerType()), ("column2", T.StringType())])
    s = snapshot_view(log, None, dropped)
    assert not [c for c in s.columns if "column3" in c]
    u = s.filter(F.col("audit_id") == 2).first()
    assert u["column2"] == "b"
    # the data survives in the log: re-adding the column to the spec
    # resurfaces historical values (stronger than PG, where DROP destroys)
    readded = _spec(
        [("id", T.IntegerType()), ("column2", T.StringType()), ("column3", T.DecimalType(8, 2))]
    )
    r = delta_view(log, None, readded).filter(F.col("audit_id") == 1).first()
    assert r["new_column3"] == Decimal("5.00")
