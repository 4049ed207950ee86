"""Stream-stream interval join with watermarks: purchases matched to the
same user's signup within 24h (the streaming twin of the batch
activity_after_signup range join). State on both sides is bounded by the
watermark + the time-range condition."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def test_stream_stream_interval_join(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    d = dt.datetime
    rows = [
        Row(event_id=1, ts=d(2024, 1, 1, 9, 0), user_id=1, event_type="signup"),
        Row(event_id=2, ts=d(2024, 1, 1, 12, 0), user_id=1, event_type="purchase"),  # +3h: match
        Row(event_id=3, ts=d(2024, 1, 3, 9, 0), user_id=1, event_type="purchase"),  # +48h: no match
        Row(event_id=4, ts=d(2024, 1, 1, 10, 0), user_id=2, event_type="purchase"),  # no signup
        Row(event_id=5, ts=d(2024, 1, 2, 8, 0), user_id=3, event_type="signup"),
        Row(event_id=6, ts=d(2024, 1, 2, 9, 30), user_id=3, event_type="purchase"),  # +1.5h: match
    ]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(src)

    events = spark.readStream.schema(EV_SCHEMA).parquet(src)
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("signup_ts"),
        )
        .withWatermark("signup_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (F.col("purchase_ts") < F.col("signup_ts") + F.expr("INTERVAL 24 HOURS")),
        "inner",
    ).select("event_id", "user_id", "purchase_ts", "signup_ts")

    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {r["event_id"]: r["user_id"] for r in spark.read.parquet(out).collect()}
    assert got == {2: 1, 6: 3}
