"""Streaming dedup: re-delivered events are emitted exactly once, and
state is bounded by the watermark (late replays beyond the horizon are
dropped by the watermark, not re-emitted).

Same determinism device as test_streaming_analytics: two sequential
``availableNow`` runs over one checkpoint — run 1 commits a watermark
that governs run 2.
"""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import types as T

from audit_star_spark.streaming.dedup import dedup_stream

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, out, ckpt):
    stream = dedup_stream(
        spark.readStream.schema(EV_SCHEMA).parquet(src),
        keys=["event_id"],
        ts_col="ts",
        watermark="1 day",
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


def test_redelivered_events_emitted_once(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    d = dt.datetime
    _write(
        spark,
        src,
        [
            Row(event_id=1, ts=d(2024, 1, 1, 10), event_type="a"),
            Row(event_id=2, ts=d(2024, 1, 1, 11), event_type="b"),
            Row(event_id=1, ts=d(2024, 1, 1, 10), event_type="a"),  # dup in-batch
        ],
    )
    _run(spark, src, out, ckpt)

    # run 2: one replayed event (dup across batches, within watermark
    # state) and one genuinely new event
    _write(
        spark,
        src,
        [
            Row(event_id=2, ts=d(2024, 1, 1, 11), event_type="b"),
            Row(event_id=3, ts=d(2024, 1, 1, 12), event_type="c"),
        ],
    )
    _run(spark, src, out, ckpt)

    got = sorted(
        (r.event_id, r.event_type) for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_batch_and_stream_dedup_agree(spark, tmp_path):
    """The streaming dedup over a replayed feed must converge to the same
    row set as a batch dropDuplicates over the union of all deliveries."""
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    d = dt.datetime
    rows = [
        Row(event_id=i, ts=d(2024, 1, 1, 9 + (i % 3)), event_type="xyz"[i % 3])
        for i in range(20)
    ]
    _write(spark, src, rows + rows[:7])
    _write(spark, src, rows[5:12])
    _run(spark, src, out, ckpt)

    batch = spark.createDataFrame(rows + rows[:7] + rows[5:12], EV_SCHEMA).dropDuplicates(
        ["event_id"]
    )
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    want = sorted(r.event_id for r in batch.collect())
    assert got == want


def test_streaming_neardup_matches_batch_lsh(spark, tmp_path):
    """Incremental LSH over 3 arrivals must emit EXACTLY the batch
    operator's pair set over the union — each pair once, in the batch
    where its later document arrived — and a replayed micro-batch must
    not duplicate pairs or signatures."""
    from audit_star_spark.analytics.dedup import minhash_lsh_pairs
    from audit_star_spark.streaming.dedup import StreamingNearDup

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(150)
    )
    rows = docs.collect()
    chunks = [rows[0:50], rows[50:100], rows[100:150]]
    nd = StreamingNearDup(
        str(tmp_path / "store"), str(tmp_path / "pairs"), threshold=0.7
    )
    src = str(tmp_path / "src")
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        nd.start(stream, str(tmp_path / "ckpt")).awaitTermination()

    want = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            spark.createDataFrame(rows, "doc_id long, text string"), threshold=0.7
        ).collect()
    }
    got_rows = nd.pairs(spark).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in got_rows}
    # default sketch_k=256 exceeds every sf0.001 doc's distinct-shingle
    # count (max ~97), so the bottom-k estimator is exact here and parity
    # with the batch operator is still strict equality
    assert got == want
    assert len(got_rows) == len(got)  # exactly-once: no duplicate rows
    assert len(want) > 0  # the corpus actually has near-dups at 0.7

    # the store must hold bounded sketches, never full shingle sets
    store = spark.read.parquet(str(tmp_path / "store"))
    assert "sset" not in store.columns and "shash" not in store.columns
    assert "sketch" in store.columns
    from pyspark.sql import functions as F

    assert store.agg(F.max(F.size("sketch"))).first()[0] <= nd.sketch_k

    # crash-replay of the final batch: both sinks must be unchanged
    last_batch = spark.createDataFrame(chunks[-1], "doc_id long, text string")
    n_before = nd.pairs(spark).count()
    sig_before = spark.read.parquet(str(tmp_path / "store")).count()
    nd.process_batch(last_batch, 2)
    assert nd.pairs(spark).count() == n_before
    assert spark.read.parquet(str(tmp_path / "store")).count() == sig_before
    assert {(r["doc_a"], r["doc_b"]) for r in nd.pairs(spark).collect()} == want


def test_streaming_neardup_sketch_estimator_tolerance(spark, tmp_path):
    """With sketch_k SMALLER than the documents' shingle counts the
    bottom-k estimator is genuinely sampled. Contract: the streamed pair
    set may disagree with the exact batch operator ONLY for pairs whose
    exact Jaccard lies inside the +-tol band around the threshold
    (tol = 4 * sqrt(J(1-J)/k), ~4 sigma); everything clearly above the
    threshold is found, nothing clearly below it is emitted. Also locks
    the storage bound: sketches are capped at k entries."""
    import math

    from pyspark.sql import functions as F

    from audit_star_spark.analytics.dedup import _shingled, minhash_lsh_pairs
    from audit_star_spark.streaming.dedup import StreamingNearDup

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(150)
    )
    rows = docs.collect()
    k = 32
    thr = 0.7
    tol = 4 * math.sqrt(thr * (1 - thr) / k)

    nd = StreamingNearDup(
        str(tmp_path / "store"), str(tmp_path / "pairs"), threshold=thr, sketch_k=k
    )
    for i, chunk in enumerate([rows[:75], rows[75:]]):
        nd.process_batch(
            spark.createDataFrame(chunk, "doc_id long, text string"), i
        )

    got = {(r["doc_a"], r["doc_b"]) for r in nd.pairs(spark).collect()}
    want = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            spark.createDataFrame(rows, "doc_id long, text string"), threshold=thr
        ).collect()
    }

    # exact Jaccard per doc pair, computed independently on the driver
    sets = {
        r["doc_id"]: set(r["sh"])
        for r in _shingled(spark.createDataFrame(rows, "doc_id long, text string"))
        .select("doc_id", F.array_distinct("shash").alias("sh"))
        .collect()
    }

    def jac(a, b):
        sa, sb = sets[a], sets[b]
        return len(sa & sb) / len(sa | sb) if sa | sb else 0.0

    for a, b in got ^ want:
        assert abs(jac(a, b) - thr) <= tol, (a, b, jac(a, b))
    # the clear positives were all found despite the sampled sketches
    assert {(a, b) for (a, b) in want if jac(a, b) >= thr + tol} <= got
    assert len(want) > 0

    store = spark.read.parquet(str(tmp_path / "store"))
    assert store.agg(F.max(F.size("sketch"))).first()[0] <= k
    # sketches ARE truncated at this k (the estimator path is exercised)
    assert store.agg(F.max(F.size("sketch"))).first()[0] == k


def test_streaming_neardup_store_compaction(spark, tmp_path):
    """compact() folds the per-batch signature partitions into one
    baseline partition between triggers; subsequent batches still emit
    exactly the batch operator's cross/new pairs, exactly once."""
    import os

    from audit_star_spark.analytics.dedup import minhash_lsh_pairs
    from audit_star_spark.streaming.dedup import StreamingNearDup

    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(150)
        .collect()
    )
    nd = StreamingNearDup(str(tmp_path / "store"), str(tmp_path / "pairs"))
    for i, chunk in enumerate([rows[:50], rows[50:100]]):
        nd.process_batch(spark.createDataFrame(chunk, "doc_id long, text string"), i)
    nd.compact(spark)
    parts = [p for p in os.listdir(str(tmp_path / "store"))
             if p.startswith("ingest_batch_id=")]
    assert parts == ["ingest_batch_id=-1"]
    nd.process_batch(
        spark.createDataFrame(rows[100:150], "doc_id long, text string"), 2
    )
    want = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            spark.createDataFrame(rows, "doc_id long, text string"), threshold=0.7
        ).collect()
    }
    got_rows = nd.pairs(spark).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in got_rows}
    assert got == want
    assert len(got_rows) == len(got)  # still exactly-once


def test_streaming_neardup_live_trigger(spark, tmp_path):
    """Live (non-availableNow) trigger: arrivals flow through live
    micro-batches and the pair sink converges to the batch operator's
    result, exactly once."""
    import time

    from audit_star_spark.analytics.dedup import minhash_lsh_pairs
    from audit_star_spark.streaming.dedup import StreamingNearDup

    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(100)
        .collect()
    )
    src = str(tmp_path / "src")
    nd = StreamingNearDup(str(tmp_path / "store"), str(tmp_path / "pairs"))
    spark.createDataFrame(rows[:50], "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(src)
    q = nd.start(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        str(tmp_path / "ckpt"),
        available_now=False,
    )

    def wait_for(cond, timeout=90.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            try:
                if cond():
                    return
            except Exception:
                pass
            time.sleep(0.5)
        raise AssertionError("timed out waiting for live micro-batch")

    try:
        wait_for(lambda: spark.read.parquet(str(tmp_path / "store")).count() == 50)
        spark.createDataFrame(rows[50:], "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
        wait_for(lambda: spark.read.parquet(str(tmp_path / "store")).count() == 100)
    finally:
        q.stop()
        q.awaitTermination()
    want = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            spark.createDataFrame(rows, "doc_id long, text string"), threshold=0.7
        ).collect()
    }
    got_rows = nd.pairs(spark).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in got_rows}
    assert got == want
    assert len(got_rows) == len(got)
