"""Streaming DSIR bucket counts (streaming/dsir_counts.py): the merge
law (streamed log-ratio table ≡ batch dsir_log_ratio_table of the full
history — EXACT, integer counts), replay idempotence, compaction +
post-compaction replay pruning, scoring parity against the batch
operator, and a real availableNow stream."""

import os

import pytest
from pyspark.sql import functions as F

TARGET = "source = 'tgt'"
B = 64

DOCS = [
    (1, "zebra quagga stripe zebra herd alpha", "tgt"),
    (2, "zebra quagga savanna stripe beta", "tgt"),
    (3, "rocket engine thrust nozzle fuel", "raw"),
    (4, "rocket stage booster engine flight", "raw"),
    (5, "zebra rocket mixed content here", "raw"),
    (6, "solo", "raw"),  # single token: unigram only
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _batch_ratio(spark, rows):
    from audit_star_spark.analytics.dsir import (
        dsir_log_ratio_table,
        hashed_ngram_counts,
    )

    docs = _df(spark, rows)
    counts = hashed_ngram_counts(docs, B)
    return {
        r["bucket"]: r["lr"]
        for r in dsir_log_ratio_table(
            counts, docs.filter(F.expr(TARGET)).select("doc_id"), B
        ).collect()
    }


def _store_ratio(spark, st):
    return {r["bucket"]: r["lr"] for r in st.ratio_table(spark).collect()}


@pytest.fixture()
def st(tmp_path):
    from audit_star_spark.streaming.dsir_counts import StreamingDSIRCounts

    return StreamingDSIRCounts(str(tmp_path / "dsir"), target=TARGET, n_buckets=B)


def test_merge_law_exact(spark, st):
    st.apply_batch(_df(spark, DOCS[:3]), 0)
    st.apply_batch(_df(spark, DOCS[3:]), 1)
    got, want = _store_ratio(spark, st), _batch_ratio(spark, DOCS)
    assert got == want  # EXACT: same integer counts, same ln arguments
    assert len(got) == B  # every bucket present, unseen get the floor


def test_replay_and_compaction(spark, st):
    st.apply_batch(_df(spark, DOCS[:3]), 0)
    st.apply_batch(_df(spark, DOCS[3:]), 1)
    want = _store_ratio(spark, st)
    st.apply_batch(_df(spark, DOCS[3:]), 1)  # replay overwrites own partition
    assert _store_ratio(spark, st) == want
    st.compact(spark)
    assert _store_ratio(spark, st) == want
    parts = {p for p in os.listdir(st.store_path) if p.startswith("ingest_")}
    assert parts == {"ingest_batch_id=-1"}
    st.apply_batch(_df(spark, DOCS[3:]), 1)  # replay AFTER compaction: pruned
    assert _store_ratio(spark, st) == want
    new = (7, "fresh target words zebra quagga", "tgt")
    st.apply_batch(_df(spark, [new]), 2)
    assert _store_ratio(spark, st) == _batch_ratio(spark, DOCS + [new])


def test_scoring_matches_batch_operator(spark, st):
    """Scoring candidates via the store ≡ dsir_log_weights on the full
    corpus (exact: same counts, same lr, same sorted fold)."""
    from audit_star_spark.analytics.dsir import dsir_log_weights

    st.apply_batch(_df(spark, DOCS[:3]), 0)
    st.apply_batch(_df(spark, DOCS[3:]), 1)
    docs = _df(spark, DOCS)
    cands = docs.filter(f"NOT ({TARGET})")
    got = {
        r["doc_id"]: r["log_w"] for r in st.log_weights(cands).collect()
    }
    want = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(docs, TARGET, n_buckets=B).collect()
    }
    assert got == want


def test_availablenow_stream_end_to_end(spark, st, tmp_path):
    src = str(tmp_path / "src")
    _df(spark, DOCS).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    st.ingest(stream, str(tmp_path / "ck")).awaitTermination()
    assert _store_ratio(spark, st) == _batch_ratio(spark, DOCS)
