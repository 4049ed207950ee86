"""Unit tests for the hstore-style map algebra (SURVEY §2A A1–A7)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from audit_star_spark.functions.maps import (
    canonical_diff_string,
    map_diff,
    map_key_present,
    map_lookup,
    row_to_map,
    truncate_values,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _maps_df(spark, a: dict, b: dict):
    return spark.createDataFrame(
        [Row(a=a, b=b)], "a map<string,string>, b map<string,string>"
    )


def test_map_diff_changed_and_removed_keys(spark):
    df = _maps_df(spark, {"x": "1", "y": "2", "z": "3"}, {"x": "1", "y": "9"})
    out = df.select(map_diff("a", "b").alias("d")).collect()[0]["d"]
    # x identical -> dropped; y differs -> kept; z absent from b -> kept
    assert out == {"y": "2", "z": "3"}


def test_map_diff_null_values_hstore_semantics(spark):
    # hstore: ('k', NULL) in both sides -> equal -> excluded;
    # ('k', NULL) vs ('k', 'v') -> kept.
    df = _maps_df(spark, {"p": None, "q": None}, {"p": None, "q": "set"})
    out = df.select(map_diff("a", "b").alias("d")).collect()[0]["d"]
    assert out == {"q": None}


def test_map_diff_null_vs_missing_key(spark):
    # key with NULL value on the left, absent on the right: hstore keeps it
    df = _maps_df(spark, {"only_left": None}, {"other": "1"})
    out = df.select(map_diff("a", "b").alias("d")).collect()[0]["d"]
    assert out == {"only_left": None}


def test_row_to_map_stringifies_and_keeps_nulls(spark):
    df = spark.createDataFrame([Row(i=7, s="hi", n=None)], "i int, s string, n string")
    m = df.select(
        row_to_map({"i": F.col("i"), "s": F.col("s"), "n": F.col("n")}).alias("m")
    ).collect()[0]["m"]
    assert m == {"i": "7", "s": "hi", "n": None}


def test_truncate_values_caps_at_500(spark):
    df = _maps_df(spark, {"big": "x" * 600, "small": "ok"}, {})
    out = df.select(truncate_values("a").alias("t")).collect()[0]["t"]
    assert len(out["big"]) == 500 and out["small"] == "ok"


def test_key_present_and_lookup(spark):
    df = _maps_df(spark, {"a": "1", "b": None}, {})
    row = df.select(
        map_key_present("a", "a").alias("pa"),
        map_key_present("a", "b").alias("pb"),
        map_key_present("a", "zz").alias("pz"),
        map_lookup("a", "a").alias("va"),
        map_lookup("a", "zz").alias("vz"),
    ).collect()[0]
    assert row["pa"] and row["pb"] and not row["pz"]
    assert row["va"] == "1" and row["vz"] is None


def test_canonical_diff_string_sorted_and_null_marker(spark):
    df = _maps_df(spark, {"z": "1", "a": "2", "m": None}, {})
    s = df.select(canonical_diff_string("a").alias("s")).collect()[0]["s"]
    assert s == "a=2|m=∅|z=1"
