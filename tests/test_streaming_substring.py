"""Streaming exact-substring dedup (streaming/substring.py): batch ≡
stream parity under doc_id-ordered arrival, strict replay determinism,
compaction + post-compaction replay pruning, real availableNow stream."""

import os

import pytest
from pyspark.sql import functions as F

K = 4

DOCS = [
    (1, "alpha beta gamma delta unique opening one"),
    (2, "second doc alpha beta gamma delta closing words"),   # dups doc 1's run
    (3, "wholly original content nothing shared here at all"),
    (10, "third copy alpha beta gamma delta trailing bits"),  # dups again
    (11, "wholly original content nothing shared here at all"),  # full dup of 3
    (12, "short one"),                                        # < k tokens
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_reference(spark, rows):
    from audit_star_spark.analytics.dedup import substring_dedup_rewrite

    return {
        r["doc_id"]: tuple(r)
        for r in substring_dedup_rewrite(_df(spark, rows), k=K).collect()
    }


def _results(spark, st):
    return {r["doc_id"]: tuple(r) for r in st.results(spark).collect()}


@pytest.fixture()
def st(tmp_path):
    from audit_star_spark.streaming.substring import StreamingSubstringDedup

    return StreamingSubstringDedup(
        str(tmp_path / "store"), str(tmp_path / "results"), k=K
    )


def test_stream_equals_batch_under_ordered_arrival(spark, st):
    """doc_id-ordered batches make arrival order == global (doc_id,pos)
    order, so the streamed reports must equal the batch operator on the
    union, row for row."""
    st.process_batch(_df(spark, DOCS[:3]), 0)
    st.process_batch(_df(spark, DOCS[3:]), 1)
    assert _results(spark, st) == _batch_reference(spark, DOCS)


def test_replay_is_byte_identical_even_after_later_batches(spark, st):
    st.process_batch(_df(spark, DOCS[:3]), 0)
    st.process_batch(_df(spark, DOCS[3:]), 1)
    want = _results(spark, st)
    # strict rule: batch 0 consults only ingest_batch_id < 0 partitions,
    # so replaying it AFTER batch 1 rewrites identical partitions
    st.process_batch(_df(spark, DOCS[:3]), 0)
    assert _results(spark, st) == want


def test_compaction_preserves_dedup_and_prunes_replays(spark, st):
    st.process_batch(_df(spark, DOCS[:3]), 0)
    st.process_batch(_df(spark, DOCS[3:]), 1)
    st.compact(spark)
    store = spark.read.parquet(st.store_dir)
    assert set(
        int(r["ingest_batch_id"])
        for r in store.select("ingest_batch_id").distinct().collect()
    ) == {-1}
    # a fresh batch still deduplicates against the folded baseline
    st.process_batch(
        _df(spark, [(20, "again alpha beta gamma delta here too")]), 2
    )
    got = _results(spark, st)
    assert got[20][3] >= K  # n_removed_tokens: the planted run came out
    # replaying a FOLDED batch: its partition re-appears but visible()
    # prunes it, and its own baseline hashes are dropped as authoritative
    want = got
    st.process_batch(_df(spark, DOCS[:3]), 0)
    assert _results(spark, st) == want


def test_real_stream_available_now(spark, st, tmp_path):
    src = str(tmp_path / "src")
    _df(spark, DOCS).repartition(1).write.parquet(src)
    q = st.start(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = _results(spark, st)
    # one batch = the whole corpus: exact batch-operator equality
    assert got == _batch_reference(spark, DOCS)
    assert os.path.isdir(st.store_dir)


def test_verify_store_certifies_no_collisions(spark, st):
    """The offline integrity pass over the ingested corpus: all-zero
    collision/orphan/owner-mismatch tail certifies the md5 60-bit
    identity behaved exactly like the collision-free batch identity on
    this corpus; a corpus/store mismatch is reported, not hidden."""
    st.process_batch(_df(spark, DOCS[:3]), 0)
    st.process_batch(_df(spark, DOCS[3:]), 1)
    row = st.verify_store(spark, _df(spark, DOCS)).collect()[0]
    assert row["n_store_hashes"] > 0
    assert row["n_collisions"] == 0
    assert row["n_orphan_hashes"] == 0
    assert row["n_owner_mismatches"] == 0
    # verification also holds across compaction (baseline partition)
    st.compact(spark)
    row = st.verify_store(spark, _df(spark, DOCS)).collect()[0]
    assert (row["n_collisions"], row["n_orphan_hashes"],
            row["n_owner_mismatches"]) == (0, 0, 0)
    # a corpus that is MISSING an ingested doc shows orphan hashes
    partial = st.verify_store(spark, _df(spark, DOCS[1:])).collect()[0]
    assert partial["n_orphan_hashes"] > 0
