"""Streaming C4 sentence-span dedup (streaming/sentence_span.py):
batch ≡ stream parity under doc_id-ordered arrival, strict replay
determinism, compaction + post-compaction replay pruning, real
availableNow stream."""

import os

import pytest

SPAN = 3

S = [f"sentence number {i} stands here." for i in range(12)]

PAGES = [
    (1, "\n".join(S[0:6])),
    (2, "\n".join(["opener line one."] + S[1:5] + ["closer line two."])),
    (3, "\n".join(S[6:8])),                # < span sentences: untouched
    (10, "\n".join(S[8:11] * 2)),          # within-page tandem repeat
    (11, "\n".join(S[0:6])),               # whole-page duplicate of 1
    (12, "\n".join(["solo unique line."] + S[6:8])),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, page string")


def _batch_reference(spark, rows):
    from audit_star_spark.analytics.dedup import sentence_span_dedup

    return {
        r["doc_id"]: tuple(r)
        for r in sentence_span_dedup(_df(spark, rows), span=SPAN).collect()
    }


def _results(spark, st):
    return {r["doc_id"]: tuple(r) for r in st.results(spark).collect()}


@pytest.fixture()
def st(tmp_path):
    from audit_star_spark.streaming.sentence_span import (
        StreamingSentenceSpanDedup,
    )

    return StreamingSentenceSpanDedup(
        str(tmp_path / "store"), str(tmp_path / "results"), span=SPAN
    )


def test_stream_equals_batch_under_ordered_arrival(spark, st):
    """doc_id-ordered batches make arrival order == global (doc_id,pos)
    order, so the streamed reports must equal the batch operator on the
    union, row for row."""
    st.process_batch(_df(spark, PAGES[:3]), 0)
    st.process_batch(_df(spark, PAGES[3:]), 1)
    assert _results(spark, st) == _batch_reference(spark, PAGES)


def test_replay_is_byte_identical_even_after_later_batches(spark, st):
    st.process_batch(_df(spark, PAGES[:3]), 0)
    st.process_batch(_df(spark, PAGES[3:]), 1)
    want = _results(spark, st)
    st.process_batch(_df(spark, PAGES[:3]), 0)
    assert _results(spark, st) == want


def test_compaction_preserves_dedup_and_prunes_replays(spark, st):
    st.process_batch(_df(spark, PAGES[:3]), 0)
    st.process_batch(_df(spark, PAGES[3:]), 1)
    st.compact(spark)
    store = spark.read.parquet(st.store_dir)
    assert set(
        int(r["ingest_batch_id"])
        for r in store.select("ingest_batch_id").distinct().collect()
    ) == {-1}
    # a fresh page still deduplicates against the folded baseline
    st.process_batch(_df(spark, [(20, "\n".join(S[0:4]))]), 2)
    got = _results(spark, st)
    assert got[20][3] >= SPAN  # n_removed_sentences: the span came out
    # replaying a FOLDED batch: visible() prunes its stale partition and
    # its own baseline keys are dropped as authoritative
    want = got
    st.process_batch(_df(spark, PAGES[:3]), 0)
    assert _results(spark, st) == want


def test_real_stream_available_now(spark, st, tmp_path):
    src = str(tmp_path / "src")
    _df(spark, PAGES).repartition(1).write.parquet(src)
    q = st.start(
        spark.readStream.schema("doc_id long, page string").parquet(src),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = _results(spark, st)
    assert got == _batch_reference(spark, PAGES)
    assert os.path.isdir(st.store_dir)


def test_verify_store_certifies_no_collisions(spark, st):
    st.process_batch(_df(spark, PAGES[:3]), 0)
    st.process_batch(_df(spark, PAGES[3:]), 1)
    row = st.verify_store(spark, _df(spark, PAGES)).collect()[0]
    assert row["n_store_keys"] > 0
    assert (row["n_collisions"], row["n_orphan_keys"],
            row["n_owner_mismatches"]) == (0, 0, 0)
    st.compact(spark)
    row = st.verify_store(spark, _df(spark, PAGES)).collect()[0]
    assert (row["n_collisions"], row["n_orphan_keys"],
            row["n_owner_mismatches"]) == (0, 0, 0)
    # a missing page whose spans are UNIQUE shows orphan keys
    partial = st.verify_store(spark, _df(spark, PAGES[:-1])).collect()[0]
    assert partial["n_orphan_keys"] > 0
    # a missing page that a LATER duplicate fully covers leaves no
    # orphans - but its recorded ownership no longer verifies
    partial = st.verify_store(spark, _df(spark, PAGES[1:])).collect()[0]
    assert partial["n_orphan_keys"] == 0
    assert partial["n_owner_mismatches"] > 0
