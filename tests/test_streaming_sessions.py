"""Stateful streaming sessionization: native session_window and the
custom applyInPandasWithState capped-session operator.

Determinism: two sequential ``availableNow`` passes over a shared
checkpoint; pass 2's input advances the watermark far enough to close
(and, for the custom operator, time out) everything from pass 1."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from audit_star_spark.streaming.sessions import capped_sessions, session_window_agg

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run(spark, make_stream, src, out, ckpt):
    stream = make_stream(spark.readStream.schema(EV_SCHEMA).parquet(src))
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_session_window_matches_batch_islands(spark, tmp_path):
    """Closed native session windows agree with the batch gaps-and-islands
    sessionization on (start, count, value)."""
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    d = dt.datetime
    rows = [
        # user 1: two sessions split by a 3h gap
        Row(event_id=1, ts=d(2024, 1, 1, 10, 0), user_id=1, value=5.0),
        Row(event_id=2, ts=d(2024, 1, 1, 10, 30), user_id=1, value=7.0),
        Row(event_id=3, ts=d(2024, 1, 1, 14, 0), user_id=1, value=2.0),
        # user 2: one session
        Row(event_id=4, ts=d(2024, 1, 1, 9, 0), user_id=2, value=1.0),
    ]
    _write(spark, src, rows)
    _run(spark, session_window_agg, src, out, ckpt)
    # far-future pass to push the watermark past every session's gap
    _write(spark, src, [Row(event_id=9, ts=d(2024, 2, 1), user_id=9, value=0.0)])
    _run(spark, session_window_agg, src, out, ckpt)

    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["session_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert got[(1, d(2024, 1, 1, 10, 0))] == (2, 12.0)
    assert got[(1, d(2024, 1, 1, 14, 0))] == (1, 2.0)
    assert got[(2, d(2024, 1, 1, 9, 0))] == (1, 1.0)


def test_capped_sessions_split_on_gap_and_value_cap(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    d = dt.datetime
    rows = [
        # user 1: cap (100) hit mid-stream -> eager split with NO gap
        Row(event_id=1, ts=d(2024, 1, 1, 10, 0), user_id=1, value=60.0),
        Row(event_id=2, ts=d(2024, 1, 1, 10, 10), user_id=1, value=50.0),  # 110 >= cap
        Row(event_id=3, ts=d(2024, 1, 1, 10, 20), user_id=1, value=1.0),
        # user 2: gap split only
        Row(event_id=4, ts=d(2024, 1, 1, 8, 0), user_id=2, value=3.0),
        Row(event_id=5, ts=d(2024, 1, 1, 12, 0), user_id=2, value=4.0),
    ]
    _write(spark, src, rows)
    _run(
        spark,
        lambda s: capped_sessions(s, value_cap=100.0),
        src,
        out,
        ckpt,
    )
    # watermark-advancing pass: times out the open tail sessions
    _write(spark, src, [Row(event_id=9, ts=d(2024, 2, 1), user_id=9, value=0.0)])
    _run(
        spark,
        lambda s: capped_sessions(s, value_cap=100.0),
        src,
        out,
        ckpt,
    )

    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["session_value"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] != 9
    }
    assert got[(1, d(2024, 1, 1, 10, 0))] == (2, 110.0)  # closed by cap
    assert got[(1, d(2024, 1, 1, 10, 20))] == (1, 1.0)  # timed out
    assert got[(2, d(2024, 1, 1, 8, 0))] == (1, 3.0)  # closed by gap
    assert got[(2, d(2024, 1, 1, 12, 0))] == (1, 4.0)  # timed out
