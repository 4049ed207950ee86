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
