"""Reliable-checkpoint opt-in for the iteration family
(plans/iterate.py): BPE training and distributed label propagation
produce identical results in both materialization modes, and reliable
mode actually lands round data on stable storage."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _ckpt_files(d):
    return [f for root, _, fs in os.walk(d) for f in fs if f.startswith("part-")]


def test_bpe_train_reliable_matches_local(spark, tmp_path):
    from audit_star_spark.analytics.bpe import bpe_train

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 60)
    )
    merges_a, toks_a = bpe_train(docs, n_merges=4)
    ckpt = str(tmp_path / "bpe_ckpt")
    merges_b, toks_b = bpe_train(docs, n_merges=4, checkpoint_dir=ckpt)
    assert merges_a == merges_b and len(merges_a) == 4
    a = sorted((r["doc_id"], tuple(r["toks"])) for r in toks_a.collect())
    b = sorted((r["doc_id"], tuple(r["toks"])) for r in toks_b.collect())
    assert a == b
    assert _ckpt_files(ckpt)  # rounds landed on stable storage


def test_dedup_clusters_distributed_reliable_matches_local(spark, tmp_path):
    from audit_star_spark.analytics.dedup import dedup_clusters

    # a path graph + a triangle + singletons through the DISTRIBUTED
    # path (driver_cc_max_edges=0 forces it)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    want = sorted(
        map(tuple, dedup_clusters(pairs, driver_cc_max_edges=0).collect())
    )
    ckpt = str(tmp_path / "cc_ckpt")
    got = sorted(
        map(
            tuple,
            dedup_clusters(
                pairs, driver_cc_max_edges=0, checkpoint_dir=ckpt
            ).collect(),
        )
    )
    assert got == want
    assert {c for _, c in got} == {1, 10, 20}
    assert _ckpt_files(ckpt)
