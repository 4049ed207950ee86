"""Model-based tests for context-window chunking and sequence packing."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from audit_star_spark.analytics.text import chunk_documents, sequence_packing

TOKEN = st.sampled_from(["aa", "b", "ccc"])


def _model_chunks(tokens, chunk, overlap):
    step = chunk - overlap
    n = len(tokens)
    n_chunks = max(1, -(-(n - overlap) // step))
    out = []
    for c in range(n_chunks):
        start = c * step
        out.append((c, tokens[start : start + chunk]))
    return out


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(TOKEN, min_size=1, max_size=40), min_size=1, max_size=10))
def test_chunking_matches_sliding_window_model(spark, docs):
    chunk, overlap = 16, 4
    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk, overlap).collect()
    }
    want = {}
    for i, toks in enumerate(docs):
        for c, sub in _model_chunks(toks, chunk, overlap):
            want[(i, c)] = (len(sub), " ".join(sub))
    assert got == want


def test_chunk_reconstruction_covers_every_token(spark):
    """Dropping each chunk's leading overlap (except chunk 0) and
    concatenating reconstructs the document exactly — no token is lost or
    duplicated by the windowing."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    chunk, overlap = 32, 8
    out = chunk_documents(docs, chunk, overlap).orderBy("doc_id", "chunk_id").collect()
    rebuilt = {}
    for r in out:
        toks = r["chunk_text"].split(" ") if r["chunk_text"] else []
        if r["chunk_id"] > 0:
            toks = toks[overlap:]
        rebuilt.setdefault(r["doc_id"], []).extend(toks)
    for r in docs.select("doc_id", F.expr("split(regexp_replace(trim(lower(text)), '\\\\s+', ' '), ' ')").alias("t")).collect():
        assert rebuilt[r["doc_id"]] == list(r["t"]), r["doc_id"]


def test_sequence_packing_invariants(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budget = 256
    rows = sequence_packing(docs, budget).collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], []).append(r)
    for split, rs in by_split.items():
        rs.sort(key=lambda r: r["doc_id"])
        run = 0
        for r in rs:
            assert r["pack_id"] == run // budget, (split, r)
            assert r["pack_offset"] == run % budget, (split, r)
            run += r["est_bpe_tokens"]
        # pack ids are dense from 0
        assert min(r["pack_id"] for r in rs) == 0


def test_resample_to_mix_rates_and_binding_source(spark):
    """src0 triple-weighted over two equal sources: src0 binds (rate 1),
    src1's rate is 1/3, and kept counts follow the deterministic hash."""
    from audit_star_spark.analytics.text import resample_to_mix

    docs = spark.createDataFrame(
        [(i, "src0" if i < 30 else "src1", "t") for i in range(60)],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r for r in resample_to_mix(docs, {"src0": 3.0}).collect()}
    assert got["src0"]["rate"] == 1.0 and got["src0"]["n_kept"] == 30
    assert abs(got["src1"]["rate"] - 1 / 3) < 1e-9
    assert 0 < got["src1"]["n_kept"] < 30
    # deterministic: same run, same kept counts
    again = {r["source"]: r["n_kept"] for r in resample_to_mix(docs, {"src0": 3.0}).collect()}
    assert again == {k: v["n_kept"] for k, v in got.items()}


def test_length_bucketed_batches_semantics(spark):
    """Sorted-by-length batching: batch members are length-contiguous,
    padding accounted against each batch's own max."""
    from audit_star_spark.analytics.text import length_bucketed_batches

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in
         enumerate([5, 3, 9, 3, 7, 1, 9, 2])],
        "doc_id long, text string",
    )
    rows = {r["batch_id"]: r for r in
            length_bucketed_batches(docs, batch_size=4).collect()}
    # sorted lengths: 1,2,3,3 | 5,7,9,9
    assert rows[0]["batch_max_tokens"] == 3 and rows[0]["batch_tokens"] == 9
    assert rows[0]["padded_tokens"] == 3
    assert rows[1]["batch_max_tokens"] == 9 and rows[1]["batch_tokens"] == 30
    assert rows[1]["padded_tokens"] == 6
    # bucketing beats one global batch: total pad 9 < 8*9 - 39 = 33
    assert sum(r["padded_tokens"] for r in rows.values()) < 33
