"""Streaming CCNet disposition (streaming/ccnet.py): the parity law
(streamed disposition ≡ batch ccnet_disposition of the full history),
replay idempotence, compaction + post-compaction replay pruning, and a
real availableNow stream."""

import os

import pytest

# multi-language, with exact duplicates and unscorable (one-token) docs;
# enough scorable docs per language that 3 bins are non-degenerate
DOCS = [
    (1, "the quick brown fox and the lazy dog of a farm"),
    (2, "a cat and the dog of the house and a mouse"),
    (3, "the rain and the sun of a long day and a night"),
    (4, "a strange word salad of the and a the zzz qqq"),
    (5, "the quick brown fox and the lazy dog of a farm"),  # dup of 1
    (6, "der hund und die katze und das haus der stadt"),
    (7, "die sonne und der regen und das wetter der nacht"),
    (8, "das auto und der zug und die strasse der stadt"),
    (9, "der der die das und und haus haus zug zug"),
    (10, "the"),  # one marker token: langid=en but no bigrams -> unscorable
    (11, "zz qq xx vv"),  # no markers -> unknown language
]
LATER = [
    (12, "the night and the day of a quiet farm and a road"),
    (13, "das wetter und die nacht und der morgen der stadt"),
    (14, "a cat and the dog of the house and a mouse"),  # dup of 2
]


def _df(spark, rows, labeled=False):
    """The stream is unlabeled (crawl shape); the BATCH reference needs
    the documents-table ``lang`` column with_lang_id carries through —
    pad a constant label for it (ccnet only ever uses pred_lang)."""
    df = spark.createDataFrame(rows, "doc_id long, text string")
    if labeled:
        from pyspark.sql import functions as F

        df = df.withColumn("lang", F.lit("x"))
    return df


def _batch_reference(spark, rows, mode="distributed"):
    from audit_star_spark.analytics.lm import ccnet_disposition

    return _rows(ccnet_disposition(_df(spark, rows, labeled=True), mode=mode))


def _rows(df):
    """ppl6 is rounded to 6dp by both paths; compare it exactly — the
    rounding is the documented cross-path stability boundary."""
    return sorted(
        (
            r["doc_id"],
            r["pred_lang"],
            r["is_dup"],
            r["ppl6"],
            r["bin"],
            r["disposition"],
        )
        for r in df.collect()
    )


@pytest.fixture()
def st(tmp_path):
    from audit_star_spark.streaming.ccnet import StreamingCCNet

    return StreamingCCNet(str(tmp_path / "ccnet"))


def test_streamed_disposition_equals_batch_of_history(spark, st):
    st.apply_batch(_df(spark, DOCS[:6]), 0)
    st.apply_batch(_df(spark, DOCS[6:]), 1)
    assert _rows(st.disposition(spark)) == _batch_reference(spark, DOCS)
    # every verdict class is actually exercised by the fixture
    kinds = {t[5] for t in _rows(st.disposition(spark))}
    assert kinds == {
        "drop_duplicate",
        "drop_lang",
        "drop_unscorable",
        "keep_head",
        "keep_middle",
        "drop_tail",
    }
    # both cut modes agree (the batch operator's test-locked law holds
    # through the store read path too)
    assert _rows(st.disposition(spark, mode="window")) == _rows(
        st.disposition(spark, mode="distributed")
    )


def test_verdicts_shift_with_the_corpus(spark, st):
    """READ-TIME semantics: bins are corpus-relative (the CCNet
    contract), so growing the corpus re-bins and a later duplicate of
    an early doc is dropped while the early keeper stays kept."""
    st.apply_batch(_df(spark, DOCS), 0)
    st.apply_batch(_df(spark, LATER), 1)
    got = _rows(st.disposition(spark))
    assert got == _batch_reference(spark, DOCS + LATER)
    by_id = {t[0]: t for t in got}
    assert by_id[2][5] != "drop_duplicate"  # early keeper
    assert by_id[14][5] == "drop_duplicate"  # later arrival of same text


def test_replay_and_compaction_idempotent(spark, st):
    st.apply_batch(_df(spark, DOCS[:6]), 0)
    st.apply_batch(_df(spark, DOCS[6:]), 1)
    want = _rows(st.disposition(spark))
    st.apply_batch(_df(spark, DOCS[6:]), 1)  # replay: overwrites own partitions
    assert _rows(st.disposition(spark)) == want
    st.compact(spark)
    assert _rows(st.disposition(spark)) == want
    for d in (st.registry_dir, st.counts_dir):
        parts = {p for p in os.listdir(d) if p.startswith("ingest_")}
        assert parts == {"ingest_batch_id=-1"}
    st.apply_batch(_df(spark, DOCS[6:]), 1)  # replay AFTER compaction: pruned
    assert _rows(st.disposition(spark)) == want
    # growth continues against the folded baseline
    st.apply_batch(_df(spark, LATER), 2)
    assert _rows(st.disposition(spark)) == _batch_reference(spark, DOCS + LATER)


def test_empty_store_reads_none(spark, st):
    assert st.disposition(spark) is None


def test_availablenow_stream_end_to_end(spark, st, tmp_path):
    src = str(tmp_path / "src")
    _df(spark, DOCS).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    st.start(stream, str(tmp_path / "ck")).awaitTermination()
    assert _rows(st.disposition(spark)) == _batch_reference(spark, DOCS)
