"""Streaming IVF maintenance (streaming/ivf.py): assign-on-ingest with
frozen centroids, union reads, replayed-batch idempotence, crash-atomic
merge into the index, and post-merge replay pruning."""

import os

import pytest
from pyspark.sql import functions as F

from audit_star_spark.analytics.ivf_index import build_ivf_index
from audit_star_spark.analytics.similarity import VEC_EXPR
from audit_star_spark.streaming.ivf import StreamingIVFIngest
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _queries(emb, n):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.expr(VEC_EXPR).alias("qvec")
    )


def _setup(spark, emb, tmp_path, cut=400):
    """Index built over vec_id < cut; the rest arrives via streaming."""
    idx = build_ivf_index(
        emb.filter(F.col("vec_id") < cut),
        str(tmp_path / "idx"),
        n_cells=8,
        iters=1,
    )
    ing = StreamingIVFIngest(idx.index_dir, str(tmp_path / "side"))
    rest = emb.filter(F.col("vec_id") >= cut)
    ing.process_batch(rest.filter(F.col("vec_id") % 2 == 0), 0)
    ing.process_batch(rest.filter(F.col("vec_id") % 2 == 1), 1)
    return idx, ing


def _reference(spark, emb, idx):
    """Assignment of the FULL corpus with the same frozen centroids."""
    from audit_star_spark.analytics.similarity import (
        _assign_to_cells,
        _prepared,
    )

    cents = idx.centroids(spark).select(
        "cell_id",
        F.col("centroid").alias("cvec"),
        F.col("cnorm").alias("cnorm"),
    )
    return _assign_to_cells(_prepared(emb).select("vec_id", "vec", "norm"), cents)


def test_union_assignment_equals_frozen_batch_assignment(spark, emb, tmp_path):
    idx, ing = _setup(spark, emb, tmp_path)
    got = sorted(
        (int(r["vec_id"]), int(r["cell_id"]))
        for r in ing.assignments(spark).select("vec_id", "cell_id").collect()
    )
    want = sorted(
        (int(r["vec_id"]), int(r["cell_id"]))
        for r in _reference(spark, emb, idx).select("vec_id", "cell_id").collect()
    )
    assert got == want and len(got) == emb.count()


def test_replayed_batch_is_idempotent_pre_merge(spark, emb, tmp_path):
    idx, ing = _setup(spark, emb, tmp_path)
    n = ing.assignments(spark).count()
    rest = emb.filter(F.col("vec_id") >= 400)
    ing.process_batch(rest.filter(F.col("vec_id") % 2 == 1), 1)  # replay
    assert ing.assignments(spark).count() == n
    dup = ing.assignments(spark).groupBy("vec_id").count().filter("count > 1")
    assert dup.count() == 0


def test_probe_union_matches_probe_of_merged_index(spark, emb, tmp_path):
    idx, ing = _setup(spark, emb, tmp_path)
    q = _queries(emb, 5)
    before = sorted(map(tuple, ing.probe(q, k=4, n_probe=3).collect()))
    ing.merge_into_index(spark)
    after = sorted(map(tuple, ing.probe(q, k=4, n_probe=3).collect()))
    assert before == after and before
    # post-merge the index alone answers identically
    alone = sorted(map(tuple, idx.probe(q, k=4, n_probe=3).collect()))
    assert alone == before


def test_merge_is_replay_safe_and_atomic(spark, emb, tmp_path, monkeypatch):
    idx, ing = _setup(spark, emb, tmp_path)
    total = ing.assignments(spark).count()
    ing.merge_into_index(spark)
    assert ing.assignments(spark).count() == total
    # batch 1 replayed AFTER the merge: its partition re-appears in the
    # side store but the recorded merged_through prunes it from reads
    rest = emb.filter(F.col("vec_id") >= 400)
    ing.process_batch(rest.filter(F.col("vec_id") % 2 == 1), 1)
    assert ing.assignments(spark).count() == total
    dup = ing.assignments(spark).groupBy("vec_id").count().filter("count > 1")
    assert dup.count() == 0
    # crash injection: a merge dying at the first rename leaves the
    # index readable with pre-merge contents
    ing.process_batch(
        rest.filter(F.col("vec_id") % 2 == 1).withColumn(
            "vec_id", F.col("vec_id") + 100000
        ),
        2,
    )
    import audit_star_spark.streaming.store_compact as sc

    real = os.rename
    calls = {"n": 0}

    def failing(a, b):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash at rename")
        return real(a, b)

    monkeypatch.setattr(sc.os, "rename", failing)
    with pytest.raises(RuntimeError):
        ing.merge_into_index(spark)
    monkeypatch.setattr(sc.os, "rename", real)
    n_after_crash = ing.assignments(spark).count()
    assert n_after_crash == total + rest.filter(F.col("vec_id") % 2 == 1).count()
    # and the retry completes
    ing.merge_into_index(spark)
    assert ing.assignments(spark).count() == n_after_crash


def test_streaming_ingest_end_to_end_with_lineage(spark, emb, tmp_path):
    idx = build_ivf_index(
        emb.filter(F.col("vec_id") < 400),
        str(tmp_path / "idx"),
        n_cells=8,
        iters=1,
    )
    ing = StreamingIVFIngest(idx.index_dir, str(tmp_path / "side"))
    src_dir = str(tmp_path / "arrivals")
    emb.filter(F.col("vec_id") >= 400).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    ck = str(tmp_path / "ck")
    ing.start(stream, ck).awaitTermination()
    assert ing.assignments(spark).count() == emb.count()
    ing.merge_into_index(spark)
    # a fresh checkpoint is refused once merge has folded batch ids
    with pytest.raises(RuntimeError, match="silently pruned"):
        ing.start(stream, str(tmp_path / "ck2"))


# ------------------------------------------------- PQ code maintenance
def _setup_pq(spark, emb, tmp_path, cut=400):
    """PQ-extended index over vec_id < cut; the rest streams in and
    must earn codes from the FROZEN codebook."""
    from audit_star_spark.analytics.ivf_index import add_pq_codes

    idx = build_ivf_index(
        emb.filter(F.col("vec_id") < cut),
        str(tmp_path / "idx"),
        n_cells=8,
        iters=1,
    )
    add_pq_codes(idx, emb.filter(F.col("vec_id") < cut), m_sub=4, k_codes=16)
    ing = StreamingIVFIngest(idx.index_dir, str(tmp_path / "side"))
    rest = emb.filter(F.col("vec_id") >= cut)
    ing.process_batch(rest.filter(F.col("vec_id") % 2 == 0), 0)
    ing.process_batch(rest.filter(F.col("vec_id") % 2 == 1), 1)
    return idx, ing


def test_streamed_vectors_earn_pq_codes(spark, emb, tmp_path):
    idx, ing = _setup_pq(spark, emb, tmp_path)
    side = ing._store_pq_codes(spark)
    n_new = emb.filter(F.col("vec_id") >= 400).count()
    assert side.count() == n_new
    # with all 8 cells probed and k >= corpus size, the candidate set
    # per query is exactly the live corpus — baseline AND streamed
    got = ing.probe_pq(_queries(emb, 2), k=1000, n_probe=8).collect()
    all_ids = {int(r["vec_id"]) for r in emb.select("vec_id").collect()}
    for qid in (0, 1):
        assert {
            int(r["vec_id"]) for r in got if r["query_id"] == qid
        } == all_ids


def test_streaming_probe_pq_equals_post_merge_probe(spark, emb, tmp_path):
    """The load-bearing invariant: the union read (baseline codes ∪
    side store) must rank EXACTLY like probing the merged index."""
    from audit_star_spark.analytics.ivf_index import probe_pq

    idx, ing = _setup_pq(spark, emb, tmp_path)
    q = _queries(emb, 5)
    before = sorted(map(tuple, ing.probe_pq(q, k=7, n_probe=4).collect()))
    ing.merge_into_index(spark)
    after = sorted(map(tuple, probe_pq(idx, q, k=7, n_probe=4).collect()))
    assert before == after and before


def test_pq_replay_after_merge_is_pruned(spark, emb, tmp_path):
    idx, ing = _setup_pq(spark, emb, tmp_path)
    q = _queries(emb, 3)
    ing.merge_into_index(spark)
    want = sorted(map(tuple, ing.probe_pq(q, k=5, n_probe=4).collect()))
    # replay an already-folded batch: both stores must prune it
    rest = emb.filter(F.col("vec_id") >= 400)
    ing.process_batch(rest.filter(F.col("vec_id") % 2 == 0), 0)
    got = sorted(map(tuple, ing.probe_pq(q, k=5, n_probe=4).collect()))
    assert got == want
    # and the candidate set contains no duplicate vec_ids
    cand = ing.probe_pq(q, k=500, n_probe=8).groupBy("query_id", "vec_id").count()
    assert cand.filter(F.col("count") > 1).count() == 0


def test_index_without_pq_keeps_no_pq_store(spark, emb, tmp_path):
    idx, ing = _setup(spark, emb, tmp_path)
    assert not os.path.isdir(ing.pq_store_dir)
    assert ing._store_pq_codes(spark) is None


def test_streaming_rerank_equals_post_merge_rerank(spark, emb, tmp_path):
    """Two-stage serving parity: the streaming rerank (union shortlist +
    union vectors) must rank exactly like the batch rerank against the
    merged index."""
    from audit_star_spark.analytics.ivf_index import probe_pq_rerank

    idx, ing = _setup_pq(spark, emb, tmp_path)
    q = _queries(emb, 4)
    before = sorted(
        map(tuple, ing.probe_pq_rerank(q, k=5, rerank=20, n_probe=4).collect())
    )
    ing.merge_into_index(spark)
    after = sorted(
        map(tuple, probe_pq_rerank(idx, q, k=5, rerank=20, n_probe=4).collect())
    )
    assert before == after and before
