"""Structured Streaming analytics: watermarked tumbling-window aggregation
with late-data semantics over an events feed.

Batch boundaries are made deterministic by running two sequential
``availableNow`` passes over a shared checkpoint: the watermark committed
by run 1 governs late-data dropping in run 2 (restart semantics)."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_window_agg(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .parquet(src)
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("day"),
            "event_type",
            "n",
        )
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_watermarked_daily_counts_drop_late_data(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    d = dt.datetime
    # run 1: days 1-3 -> committed watermark = day3 10:00 - 1 day
    _write(
        spark,
        src,
        [
            Row(event_id=1, ts=d(2024, 1, 1, 10), event_type="a", value=1.0),
            Row(event_id=2, ts=d(2024, 1, 1, 11), event_type="a", value=1.0),
            Row(event_id=3, ts=d(2024, 1, 2, 10), event_type="a", value=1.0),
            Row(event_id=4, ts=d(2024, 1, 3, 10), event_type="a", value=1.0),
        ],
    )
    _run_window_agg(spark, src, out, ckpt)
    # run 2: a LATE day-1 event (beyond the watermark) + days 4-5
    _write(
        spark,
        src,
        [
            Row(event_id=5, ts=d(2024, 1, 1, 12), event_type="a", value=1.0),  # late!
            Row(event_id=6, ts=d(2024, 1, 4, 10), event_type="a", value=1.0),
            Row(event_id=7, ts=d(2024, 1, 5, 10), event_type="a", value=1.0),
        ],
    )
    _run_window_agg(spark, src, out, ckpt)
    rows = {r["day"].day: r["n"] for r in spark.read.parquet(out).collect()}
    # day-1 window closed with 2 events; the late event must not reopen it
    assert rows.get(1) == 2
    assert rows.get(2) == 1


def test_streaming_counts_match_batch_for_closed_windows(spark, tmp_path):
    """Every window the stream emitted agrees with batch aggregation over
    the same (non-late) input."""
    src, out, ckpt = (str(tmp_path / p) for p in ("src2", "out2", "ckpt2"))
    d = dt.datetime
    rows1 = [
        Row(event_id=i, ts=d(2024, 1, 1 + i % 3, 8 + i % 10), event_type="t", value=1.0)
        for i in range(30)
    ]
    rows2 = [
        Row(event_id=100 + i, ts=d(2024, 1, 6, 8 + i % 10), event_type="t", value=1.0)
        for i in range(5)
    ]
    _write(spark, src, rows1)
    _run_window_agg(spark, src, out, ckpt)
    _write(spark, src, rows2)
    _run_window_agg(spark, src, out, ckpt)
    streamed = {
        (r["day"], r["event_type"]): r["n"] for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["day"], r["event_type"]): r["n"]
        for r in spark.read.schema(EV_SCHEMA)
        .parquet(src)
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert streamed, "no windows closed"
    for key, n in streamed.items():
        assert batch[key] == n, f"window {key}: streamed {n} != batch {batch[key]}"


def test_sliding_window_counts_overlap(spark, tmp_path):
    """Sliding windows (2-day length, 1-day slide): each event lands in
    two windows, and closed windows match the batch equivalent."""
    src, out, ckpt = (str(tmp_path / p) for p in ("src3", "out3", "ckpt3"))
    d = dt.datetime
    _write(
        spark,
        src,
        [
            Row(event_id=1, ts=d(2024, 1, 2, 10), event_type="a", value=1.0),
            Row(event_id=2, ts=d(2024, 1, 2, 11), event_type="a", value=1.0),
            Row(event_id=3, ts=d(2024, 1, 3, 10), event_type="a", value=1.0),
        ],
    )
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .parquet(src)
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "2 days", "1 day").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("start"), "event_type", "n")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # advance the watermark far enough to close every window above
    _write(spark, src, [Row(event_id=9, ts=d(2024, 1, 10), event_type="a", value=1.0)])
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["start"].day: r["n"] for r in spark.read.parquet(out).collect() if r["start"].month == 1 and r["start"].day < 8}
    # windows [Jan1,Jan3): 2 events; [Jan2,Jan4): 3; [Jan3,Jan5): 1
    assert got == {1: 2, 2: 3, 3: 1}
