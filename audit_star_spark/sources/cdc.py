"""Synthetic CDC feed over the driver's ``events`` table.

The reference captures changes via an in-transaction trigger (EP2,
audit.go:872–926); Spark has no such hook, so the engine's canonical input
is a *change feed*: (op, full before-image, full after-image, metadata).
This module derives a deterministic feed from ``events.parquet``, modeling
a ``users`` table whose rows are mutated by the event stream:

- audited row image: id=user_id, etype=event_type, val=value as
  decimal(10,2) string, k = props->>'k' (all values stringified, hstore
  style);
- op: 'error' -> D; 'signup' or first-ever event of the user -> I;
  otherwise U;
- before image: previous event's image per user (event_id order);
- live table: image of each user's last event, dropped if that was a D.

The same derivation is mirrored in ANSI SQL for the DuckDB oracle
(queries.py), so the whole audit pipeline is differentially testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from audit_star_spark.catalog import TableSpec

USERS_SPEC = TableSpec(
    schema="app",
    name="users",
    columns=[
        ("id", T.LongType()),
        ("etype", T.StringType()),
        ("k", T.IntegerType()),
        ("val", T.DecimalType(10, 2)),
    ],
    primary_key="id",
)

# Stringified image columns (hstore stringification: decimal keeps scale).
_IMG = {
    "id": lambda: F.col("user_id").cast("string"),
    "etype": lambda: F.col("event_type"),
    "k": lambda: F.get_json_object("props", "$.k"),
    "val": lambda: F.col("value").cast("decimal(10,2)").cast("string"),
}


def users_change_feed(events: DataFrame) -> DataFrame:
    """events -> CDC feed (op, before, after, changed_at, metadata...)."""
    df = events.select(
        "event_id",
        "ts",
        "user_id",
        *[expr().alias(f"cur_{c}") for c, expr in _IMG.items()],
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    for c in _IMG:
        df = df.withColumn(f"prev_{c}", F.lag(f"cur_{c}").over(w))
    df = df.withColumn("has_prev", F.col("prev_id").isNotNull())

    op = (
        F.when(F.col("cur_etype") == "error", F.lit("D"))
        .when((F.col("cur_etype") == "signup") | ~F.col("has_prev"), F.lit("I"))
        .otherwise(F.lit("U"))
    )
    cur_img = F.create_map(
        *[x for c in _IMG for x in (F.lit(c), F.col(f"cur_{c}"))]
    )
    prev_img = F.create_map(
        *[x for c in _IMG for x in (F.lit(c), F.col(f"prev_{c}"))]
    )
    df = df.withColumn("op", op)
    before = (
        F.when(F.col("op") == "U", prev_img)
        .when(
            F.col("op") == "D",
            F.when(F.col("has_prev"), prev_img).otherwise(cur_img),
        )
        .otherwise(F.lit(None).cast("map<string,string>"))
    )
    after = F.when(F.col("op") != "D", cur_img)

    return df.select(
        "event_id",
        F.col("op"),
        before.alias("before"),
        after.alias("after"),
        F.col("ts").alias("changed_at"),
        F.concat(F.lit("agent_"), (F.col("user_id") % 7).cast("string")).alias(
            "changed_by"
        ),
        F.concat(F.lit("svc_"), (F.col("user_id") % 3).cast("string")).alias(
            "db_user"
        ),
        F.concat(F.lit("10.0.0."), (F.col("user_id") % 256).cast("string")).alias(
            "client_addr"
        ),
        (F.lit(5000) + (F.col("user_id") % 100)).cast("int").alias("client_port"),
    )


def users_live_table(events: DataFrame) -> DataFrame:
    """Current state of the synthetic users table: last event's image per
    user, unless that event was a delete ('error')."""
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    last = (
        events.select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("event_type") != "error")
    )
    return last.select(
        F.col("user_id").alias("id"),
        F.col("event_type").alias("etype"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.col("value").cast("decimal(10,2)").alias("val"),
    )


def users_audit_inputs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, TableSpec]:
    from audit_star_spark.sources.testdata import load_table

    events = load_table(spark, sf_dir, "events")
    return users_change_feed(events), users_live_table(events), USERS_SPEC


# ---------------------------------------------------------------- JSON CDC
# Debezium-style envelope (the shape real CDC connectors put on Kafka):
#   {"op": "c|u|d", "ts_ms": 1700000000000, "before": {...}|null,
#    "after": {...}|null, "source": {"db_user": ..., "client_addr": ...},
#    "transaction": null}
_DBZ_OPS = {"c": "I", "r": "I", "u": "U", "d": "D", "t": "T"}


def change_feed_from_json(
    spark: SparkSession,
    path: str,
    streaming: bool = False,
) -> DataFrame:
    """Parse a directory of Debezium-shaped JSON-lines change events into
    the engine's canonical FEED_SCHEMA. ``streaming=True`` returns a
    readStream over the same directory (file source; swap for Kafka by
    replacing the reader — the parse pipeline is identical).

    Row images arrive as JSON objects with arbitrary per-table fields, so
    they are decoded to map<string,string> (the hstore analogue) rather
    than a fixed struct — the same schema-agnostic property that lets the
    reference's trigger survive column adds/drops (docs/index.md:11).
    """
    from audit_star_spark.streaming.ingest import FEED_SCHEMA

    envelope = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("before", T.StringType()),
            T.StructField("after", T.StringType()),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("changed_by", T.StringType()),
                        T.StructField("db_user", T.StringType()),
                        T.StructField("client_addr", T.StringType()),
                        T.StructField("client_port", T.IntegerType()),
                    ]
                ),
            ),
        ]
    )
    reader = (
        spark.readStream.schema(envelope) if streaming else spark.read.schema(envelope)
    )
    raw = reader.json(path)
    op_map = F.create_map(*[F.lit(x) for kv in _DBZ_OPS.items() for x in kv])
    ms = T.MapType(T.StringType(), T.StringType())
    out = raw.select(
        "event_id",
        F.element_at(op_map, F.lower(F.col("op"))).alias("op"),
        F.from_json("before", ms).alias("before"),
        F.from_json("after", ms).alias("after"),
        F.timestamp_millis(F.col("ts_ms")).alias("changed_at"),
        F.col("source.changed_by").alias("changed_by"),
        F.col("source.db_user").alias("db_user"),
        F.col("source.client_addr").alias("client_addr"),
        F.col("source.client_port").alias("client_port"),
    )
    return out.select(*[f.name for f in FEED_SCHEMA.fields])
