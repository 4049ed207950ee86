"""Incrementally-maintained rollup: stream-maintained result equals the
batch aggregate over all arrivals, replay is idempotent, compaction
preserves the result while folding partials."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from audit_star_spark.streaming.rollup import EventRollup

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

d = dt.datetime


def _rows(batch: int):
    base = d(2024, 1, 1 + batch, 6)
    return [
        Row(event_id=batch * 10 + i, ts=base + dt.timedelta(hours=i), event_type=t, value=v)
        for i, (t, v) in enumerate(
            [("click", 1.5), ("click", 2.25), ("view", 0.5), ("purchase", 10.0)]
        )
    ]


def _want(spark, all_rows):
    return (
        spark.createDataFrame(all_rows, EV_SCHEMA)
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
            .cast("double")
            .alias("__sv"),
        )
        .select("day", "event_type", "n_events", (F.col("__sv") / 100.0).alias("total_value"))
    )


def _assert_same(got, want):
    key = ["day", "event_type", "n_events", "total_value"]
    g = sorted(tuple(r[k] for k in key) for r in got.collect())
    w = sorted(tuple(r[k] for k in key) for r in want.collect())
    assert g == w


def test_streamed_rollup_equals_batch_aggregate(spark, tmp_path):
    src, store, ckpt = (str(tmp_path / p) for p in ("src", "store", "ckpt"))
    roll = EventRollup(store)
    all_rows = []
    for batch in range(3):
        rows = _rows(batch)
        all_rows += rows
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)
        q = roll.ingest(spark.readStream.schema(EV_SCHEMA).parquet(src), ckpt)
        q.awaitTermination()
        _assert_same(roll.read(spark), _want(spark, all_rows))


def test_replayed_batch_is_idempotent_and_compact_preserves(spark, tmp_path):
    store = str(tmp_path / "store")
    roll = EventRollup(store)
    b0, b1 = _rows(0), _rows(1)
    roll.apply_batch(spark.createDataFrame(b0, EV_SCHEMA), 0)
    roll.apply_batch(spark.createDataFrame(b1, EV_SCHEMA), 1)
    want = _want(spark, b0 + b1)
    _assert_same(roll.read(spark), want)
    # crash-replay of batch 1 rewrites its own partition, never doubles
    roll.apply_batch(spark.createDataFrame(b1, EV_SCHEMA), 1)
    _assert_same(roll.read(spark), want)
    # compaction folds partials into the -1 baseline, result unchanged
    roll.compact(spark)
    _assert_same(roll.read(spark), want)
    store_df = spark.read.parquet(store)
    assert store_df.select("ingest_batch_id").distinct().collect() == [Row(ingest_batch_id=-1)]
    # and ingest can continue on top of the baseline
    b2 = _rows(2)
    roll.apply_batch(spark.createDataFrame(b2, EV_SCHEMA), 2)
    _assert_same(roll.read(spark), _want(spark, b0 + b1 + b2))


def test_live_trigger_rollup_multi_batch_and_compaction(spark, tmp_path):
    """Continuous (available_now=False) trigger: each appended file
    arrives through a live micro-batch and the maintained rollup must
    reflect it; compact() then runs BETWEEN triggers (the documented
    discipline — it uses a full overwrite and must not race an ingest)
    and preserves the result while folding partials to one partition."""
    import time

    src, store, ckpt = (str(tmp_path / p) for p in ("src", "store", "ckpt"))
    roll = EventRollup(store)
    all_rows = []

    def wait_for(cond, timeout=90.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            try:
                if cond():
                    return
            except Exception:
                pass  # store not created yet
            time.sleep(0.5)
        raise AssertionError("timed out waiting for live micro-batch")

    # the file source requires an existing path: seed batch 0 first, then
    # batches 1-2 arrive through LIVE triggers
    all_rows.extend(_rows(0))
    spark.createDataFrame(_rows(0), EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    query = roll.ingest(
        spark.readStream.schema(EV_SCHEMA).parquet(src),
        ckpt,
        available_now=False,
    )
    try:
        wait_for(
            lambda: roll.read(spark).agg(F.sum("n_events")).first()[0]
            == len(all_rows)
        )
        for batch in range(1, 3):
            rows = _rows(batch)
            all_rows.extend(rows)
            spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            want_events = len(all_rows)
            wait_for(
                lambda: roll.read(spark)
                .agg(F.sum("n_events"))
                .first()[0]
                == want_events
            )
    finally:
        query.stop()
        query.awaitTermination()
    _assert_same(roll.read(spark), _want(spark, all_rows))
    # between-trigger compaction: one baseline partition, same result
    roll.compact(spark)
    import os

    parts = [p for p in os.listdir(store) if p.startswith("ingest_batch_id=")]
    assert parts == ["ingest_batch_id=-1"]
    _assert_same(roll.read(spark), _want(spark, all_rows))
