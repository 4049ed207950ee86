"""Streaming quality gate: the foreachBatch pipeline must admit exactly
the documents the batch gate keeps, across multiple micro-batches."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from audit_star_spark.analytics.quality import (
    gopher_quality_flags,
    streaming_quality_gate,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_streaming_gate_matches_batch_gate(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    rows = docs.collect()
    half = len(rows) // 2
    for chunk in (rows[:half], rows[half:]):
        spark.createDataFrame(chunk, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
        streaming_quality_gate(stream, out, ckpt).awaitTermination()

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    want_df = spark.createDataFrame(rows, DOC_SCHEMA)
    want = {
        r["doc_id"]
        for r in gopher_quality_flags(want_df).filter(F.col("keep")).collect()
    }
    assert got == want
    assert 0 < len(got) < len(rows)  # the gate is non-trivial on this corpus


def test_gate_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a micro-batch replayed after a crash
    (sink write landed, checkpoint commit did not) must NOT duplicate
    keeper rows. The dynamic-partition-overwrite sink rewrites exactly its
    own ingest_batch_id partition on replay."""
    from audit_star_spark.analytics.quality import _gate_batch

    out = str(tmp_path / "out")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(80)
    )
    rows = docs.collect()
    half = len(rows) // 2
    b0 = spark.createDataFrame(rows[:half], DOC_SCHEMA)
    b1 = spark.createDataFrame(rows[half:], DOC_SCHEMA)

    _gate_batch(b0, 0, out)
    once = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    _gate_batch(b0, 0, out)  # crash-replay of the same micro-batch
    replayed = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert replayed == once  # no duplicates, same keeper set

    _gate_batch(b1, 1, out)  # a NEW batch must still append
    both = spark.read.parquet(out)
    assert both.count() > len(once)
    assert both.count() == both.select("doc_id").distinct().count()
