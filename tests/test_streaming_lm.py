"""Streaming Kneser-Ney trigram counts (streaming/lm_counts.py): the
merge law (streamed model ≡ batch model of the full history), replay
idempotence, compaction + post-compaction replay pruning, and a real
availableNow stream."""

import os

import pytest

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat sleeps under the warm sun"),
    (3, "a lazy dog and a quick fox share the yard"),
    (4, "the sun warms the lazy cat in the yard"),
    (5, "zebra xylophone quantum"),
    (6, "to be"),  # < 3 tokens: contributes vocab only
]

SCORE_DOCS = [
    (100, "the quick brown fox sleeps in the yard"),
    (101, "quantum entropy flux never seen trigram stream"),
    (102, "do"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _score(spark, model):
    from audit_star_spark.analytics.lm import score_kn

    return {
        r["doc_id"]: (r["n_trigrams"], r["avg_nll"])
        for r in score_kn(_df(spark, SCORE_DOCS), model).collect()
    }


def _assert_same(got, want):
    """Counts exact; avg_nll to 1e-12 relative — the per-doc mean folds
    in partition order, which differs between the store read (merged
    count partitions) and the one-shot batch plan, so the last ulp of
    the float mean is not part of the merge-law contract."""
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0], k
        if want[k][1] is None:
            assert got[k][1] is None, k
        else:
            assert got[k][1] == pytest.approx(want[k][1], rel=1e-12), k


def _batch_reference(spark, rows):
    from audit_star_spark.analytics.lm import train_kn_trigram_lm

    return _score(spark, train_kn_trigram_lm(_df(spark, rows)))


@pytest.fixture()
def st(tmp_path):
    from audit_star_spark.streaming.lm_counts import StreamingKNCounts

    return StreamingKNCounts(str(tmp_path / "kn"))


def test_streamed_model_equals_batch_of_history(spark, st):
    st.apply_batch(_df(spark, DOCS[:3]), 0)
    st.apply_batch(_df(spark, DOCS[3:]), 1)
    _assert_same(_score(spark, st.model(spark)), _batch_reference(spark, DOCS))


def test_replay_and_compaction_idempotent(spark, st):
    st.apply_batch(_df(spark, DOCS[:3]), 0)
    st.apply_batch(_df(spark, DOCS[3:]), 1)
    want = _score(spark, st.model(spark))
    st.apply_batch(_df(spark, DOCS[3:]), 1)  # replay: overwrites own partition
    _assert_same(_score(spark, st.model(spark)), want)
    st.compact(spark)
    _assert_same(_score(spark, st.model(spark)), want)
    parts = {p for p in os.listdir(st.store_path) if p.startswith("ingest_")}
    assert parts == {"ingest_batch_id=-1"}
    st.apply_batch(_df(spark, DOCS[3:]), 1)  # replay AFTER compaction: pruned
    _assert_same(_score(spark, st.model(spark)), want)
    # growth continues against the folded baseline
    st.apply_batch(_df(spark, [(7, "brand new sentence with fresh words")]), 2)
    _assert_same(
        _score(spark, st.model(spark)),
        _batch_reference(spark, DOCS + [(7, "brand new sentence with fresh words")]),
    )


def test_vocab_only_batches_still_count(spark, st):
    """Short docs carry no trigrams but must still grow the vocabulary
    (the 1/V backstop changes) — the NULL-marker row design."""
    st.apply_batch(_df(spark, DOCS[:5]), 0)
    a = _score(spark, st.model(spark))
    st.apply_batch(_df(spark, [(6, "brandnewtoken1 brandnewtoken2")]), 1)
    b = _score(spark, st.model(spark))
    # the fully-OOV doc's nll must CHANGE (V grew, uniform backstop moved)
    assert a[101] != b[101]
    _assert_same(
        b,
        _batch_reference(spark, DOCS[:5] + [(6, "brandnewtoken1 brandnewtoken2")]),
    )


def test_availablenow_stream_end_to_end(spark, st, tmp_path):
    src = str(tmp_path / "src")
    _df(spark, DOCS).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    st.ingest(stream, str(tmp_path / "ck")).awaitTermination()
    _assert_same(_score(spark, st.model(spark)), _batch_reference(spark, DOCS))
