"""Persisted IVF index (analytics/ivf_index.py): build/load/probe
parity with the inline retrain path, partition-pruned probe plan, and
no-training-on-probe locks."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    from audit_star_spark.analytics.ivf_index import build_ivf_index

    d = str(tmp_path_factory.mktemp("ivf") / "idx")
    return build_ivf_index(emb, d, n_cells=8, iters=2)


def _self_queries(emb, n_queries):
    from audit_star_spark.analytics.similarity import VEC_EXPR

    return emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.expr(VEC_EXPR).alias("qvec"),
    )


def test_build_writes_layout_and_meta(index, spark):
    m = index.meta()
    assert m["n_cells"] == 8 and m["iters"] == 2
    assert m["n_vectors"] == index.assignments(spark).count() > 0
    assert index.centroids(spark).count() <= 8
    parts = os.listdir(index._assignments_path)
    assert any(p.startswith("cell_id=") for p in parts)


def test_probe_matches_inline_retrain_exactly(index, spark, emb):
    """Index-reuse parity: probing the PERSISTED index equals training
    from scratch inline with the same params (deterministic Lloyd), row
    for row — cosines bit-equal."""
    from audit_star_spark.analytics.ivf_index import ivf_topk_trained

    want = sorted(
        map(tuple, ivf_topk_trained(emb, n_queries=6, k=5, n_cells=8, iters=2).collect())
    )
    got_df = index.probe(_self_queries(emb, 6), k=6, n_probe=4)
    # probe() does not exclude self-matches; drop them and re-rank
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    got = sorted(
        map(
            tuple,
            got_df.filter(F.col("vec_id") != F.col("query_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "rank", "vec_id", "cosine")
            .collect(),
        )
    )
    assert got == want and len(want) > 0


def test_probe_is_partition_pruned_and_training_free(index, spark, emb):
    """Plan lock: the probe's candidate scan carries a cell_id
    PartitionFilter (only probed cells' files are read), and the whole
    probe runs zero k-means / zero full-corpus jobs — the assignment
    parquet is the ONLY corpus-sized input."""
    q = _self_queries(emb, 4)
    probes_before = index.probe(q, k=3, n_probe=2)
    plan = (
        probes_before._jdf.queryExecution().executedPlan().toString()
    )
    # localCheckpoint hides the scan; re-derive the candidate scan plan
    cand = index.assignments(spark).filter(F.col("cell_id").isin([0, 1]))
    scan_plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in scan_plan and "cell_id" in scan_plan
    # and the index dir is the only parquet source in the probe
    assert "kmeans" not in plan.lower()


def test_probe_validation(index, spark, emb):
    q = _self_queries(emb, 2)
    with pytest.raises(ValueError, match="k must"):
        index.probe(q, k=0)
    with pytest.raises(ValueError, match="n_probe"):
        index.probe(q, k=3, n_probe=0)


def test_reload_from_disk_is_identical(index, spark, emb):
    """A fresh handle on the same directory (new 'session' shape)
    probes identically — the index is self-contained on disk."""
    from audit_star_spark.analytics.ivf_index import IVFIndex

    again = IVFIndex(index.index_dir)
    q = _self_queries(emb, 5)
    a = sorted(map(tuple, index.probe(q, k=4).collect()))
    b = sorted(map(tuple, again.probe(q, k=4).collect()))
    assert a == b and a


def test_semantic_dedup_from_persisted_index(index, spark, emb):
    """semantic_dedup(index=...) runs the dedup join straight off the
    persisted assignments — same keep/drop decisions as computing the
    assignment from the same centroids inline, zero training jobs."""
    from audit_star_spark.analytics.ivf_index import IVFIndex
    from audit_star_spark.analytics.similarity import (
        _assign_to_cells,
        _dot,
        _prepared,
        semantic_dedup,
    )

    got = sorted(
        map(tuple, semantic_dedup(emb, threshold=0.35, index=index).collect())
    )
    # inline reference from the SAME persisted centroids
    cents = index.centroids(spark).select(
        "cell_id",
        F.col("centroid").alias("cvec"),
        F.col("cnorm").alias("cnorm"),
    )
    assigned = _assign_to_cells(
        _prepared(emb).select("vec_id", "vec", "norm"), cents
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = _dot("a.vec", "b.vec") / (F.col("a.norm") * F.col("b.norm"))
    dup_of = (
        a.join(
            b,
            (F.col("a.cell_id") == F.col("b.cell_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= 0.35)
        .groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(F.min(F.col("a.vec_id")).alias("dup_of"))
    )
    want = sorted(
        map(
            tuple,
            assigned.drop("vec", "norm")
            .join(dup_of, "vec_id", "left")
            .select(
                "vec_id",
                "cell_id",
                "dup_of",
                F.col("dup_of").isNull().alias("kept"),
            )
            .collect(),
        )
    )
    assert got == want and got


# ------------------------------------------------------------- IVF-PQ


@pytest.fixture(scope="module")
def pq_index(spark, emb, tmp_path_factory):
    """Residual-encoded (by_residual=True, the default) IVF-PQ index."""
    from audit_star_spark.analytics.ivf_index import (
        add_pq_codes,
        build_ivf_index,
    )

    d = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    idx = build_ivf_index(emb, d, n_cells=8, iters=1)
    add_pq_codes(idx, emb, m_sub=4, k_codes=16)
    return idx


@pytest.fixture(scope="module")
def pq_index_raw(spark, emb, tmp_path_factory):
    """Raw-vector (by_residual=False) IVF-PQ index — the pre-r9 layout,
    kept as a first-class option for global-ADC parity."""
    from audit_star_spark.analytics.ivf_index import (
        add_pq_codes,
        build_ivf_index,
    )

    d = str(tmp_path_factory.mktemp("ivfpq_raw") / "idx")
    idx = build_ivf_index(emb, d, n_cells=8, iters=1)
    add_pq_codes(idx, emb, m_sub=4, k_codes=16, by_residual=False)
    return idx


def test_pq_layout_and_meta(pq_index, spark):
    import json as _json

    assert os.path.isdir(os.path.join(pq_index.index_dir, "pq_codebook"))
    parts = os.listdir(os.path.join(pq_index.index_dir, "pq_codes"))
    assert any(p.startswith("cell_id=") for p in parts)
    with open(os.path.join(pq_index.index_dir, "_ivfpq_meta.json")) as f:
        m = _json.load(f)
    assert m == {
        "m_sub": 4, "k_codes": 16, "by_residual": True, "iters": 1,
        "opq": False,
    }
    codes = spark.read.parquet(os.path.join(pq_index.index_dir, "pq_codes"))
    rows = codes.collect()
    assert len(rows) == pq_index.meta()["n_vectors"]
    assert all(len(r["codes"]) == 4 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])


def test_probe_pq_self_is_rank_one_and_deterministic(pq_index, emb):
    from audit_star_spark.analytics.ivf_index import probe_pq

    q = _self_queries(emb, 4)
    a = sorted(map(tuple, probe_pq(pq_index, q, k=5, n_probe=3).collect()))
    b = sorted(map(tuple, probe_pq(pq_index, q, k=5, n_probe=3).collect()))
    assert a == b
    best = {r[0]: r[2] for r in a if r[1] == 1}  # query_id -> rank-1 vec
    # the query IS in the corpus: with its own cell probed first, its own
    # codes give the minimal ADC (distance to its own codewords)
    assert best == {0: 0, 1: 1, 2: 2, 3: 3}


def test_probe_pq_reads_codes_not_vectors(pq_index, emb):
    """Plan lock: the ADC probe never touches the float-vector
    assignments parquet — its only corpus-sized source is pq_codes."""
    from audit_star_spark.analytics.ivf_index import probe_pq

    q = _self_queries(emb, 2)
    out = probe_pq(pq_index, q, k=3, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "kmeans" not in plan.lower()
    # localCheckpoint hides the lineage; assert on the physical files
    # the probe CAN read: codes are partition-pruned like assignments
    codes = pq_index.assignments(emb.sparkSession).sparkSession.read.parquet(
        os.path.join(pq_index.index_dir, "pq_codes")
    ).filter(F.col("cell_id").isin([0, 1]))
    scan_plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in scan_plan and "cell_id" in scan_plan


def test_probe_pq_agrees_with_global_adc_when_all_cells_probed(
    pq_index_raw, spark, emb
):
    """With n_probe = n_cells the IVF pruning is a no-op: a RAW-vector
    probe_pq must equal the global ADC ranking over the SAME persisted
    codebook (raw codes are cell-independent; residual codes are not)."""
    from audit_star_spark.analytics.ivf_index import probe_pq
    from audit_star_spark.analytics.pq import pq_adc_topk

    q = _self_queries(emb, 4)
    got = sorted(
        map(tuple, probe_pq(pq_index_raw, q, k=5, n_probe=8).collect())
    )
    cb = spark.read.parquet(os.path.join(pq_index_raw.index_dir, "pq_codebook"))
    codes = spark.read.parquet(
        os.path.join(pq_index_raw.index_dir, "pq_codes")
    ).select("vec_id", "codes")
    want = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["adc"])
        for r in pq_adc_topk(emb, cb, codes, n_queries=4, k_nn=5).collect()
    )
    assert got == want


def test_pq_meta_without_flag_reads_as_raw(pq_index_raw, spark, emb, tmp_path):
    """Back-compat: an index written before the by_residual flag (meta
    lacks the key) must probe exactly like by_residual=False."""
    import json as _json
    import shutil

    from audit_star_spark.analytics.ivf_index import IVFIndex, probe_pq

    d = str(tmp_path / "legacy")
    shutil.copytree(pq_index_raw.index_dir, d)
    mp = os.path.join(d, "_ivfpq_meta.json")
    with open(mp) as f:
        m = _json.load(f)
    m.pop("by_residual")
    with open(mp, "w") as f:
        _json.dump(m, f)
    q = _self_queries(emb, 3)
    got = sorted(map(tuple, probe_pq(IVFIndex(d), q, k=5, n_probe=3).collect()))
    want = sorted(map(tuple, probe_pq(pq_index_raw, q, k=5, n_probe=3).collect()))
    assert got == want and got


def _recall_at5(spark, emb, idx, n_queries=8):
    from pyspark.sql import Window

    from audit_star_spark.analytics.ivf_index import probe_pq
    from audit_star_spark.analytics.similarity import VEC_EXPR

    base = emb.select("vec_id", F.expr(VEC_EXPR).alias("vec"))
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    approx = probe_pq(idx, queries, k=5, n_probe=4).select("query_id", "vec_id")
    d2 = (
        "aggregate(zip_with(vec, qvec, (x, y) -> (x - y) * (x - y)), "
        "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    )
    w = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    exact = (
        base.join(F.broadcast(queries))
        .select("query_id", "vec_id", F.expr(d2).alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id")
    )
    return approx.join(exact, ["query_id", "vec_id"]).count()


def _pq_reconstruction_mse(spark, emb, idx):
    """Mean squared error of the PQ approximation of each VECTOR:
    raw indexes reconstruct x ≈ codeword(code); residual indexes
    reconstruct x ≈ coarse_centroid + codeword(code), i.e. the
    codebook's error on the residual. Both are errors on x, so the
    two layouts are directly comparable."""
    import json as _json

    from audit_star_spark.analytics.similarity import VEC_EXPR

    cb = spark.read.parquet(os.path.join(idx.index_dir, "pq_codebook"))
    codes = spark.read.parquet(os.path.join(idx.index_dir, "pq_codes"))
    with open(os.path.join(idx.index_dir, "_ivfpq_meta.json")) as f:
        meta = _json.load(f)
    m_sub = meta["m_sub"]
    if meta["by_residual"]:
        cents = idx.centroids(spark).select(
            "cell_id", F.col("centroid").alias("cvec")
        )
        tgt = (
            idx.assignments(spark)
            .join(F.broadcast(cents), "cell_id")
            .select(
                "vec_id",
                F.expr("zip_with(vec, cvec, (x, y) -> x - y)").alias("t"),
            )
        )
    else:
        tgt = emb.select("vec_id", F.expr(VEC_EXPR).alias("t"))
    w = 64 // m_sub
    sub = tgt.select(
        "vec_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {m_sub - 1}), s -> named_struct("
                f"'sub_id', s, 'sv', slice(t, s * {w} + 1, {w})))"
            )
        ).alias("x"),
    ).select("vec_id", F.col("x.sub_id").alias("sub_id"), F.col("x.sv").alias("sv"))
    ccodes = codes.select("vec_id", F.posexplode("codes").alias("sub_id", "code"))
    joined = sub.join(ccodes, ["vec_id", "sub_id"]).join(
        F.broadcast(
            cb.select("sub_id", F.col("cell_id").alias("code"), "centroid")
        ),
        ["sub_id", "code"],
    )
    return joined.select(
        F.expr(
            "aggregate(zip_with(sv, centroid, (x, y) -> (x - y) * (x - y)), "
            "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
        ).alias("e")
    ).agg(F.avg("e")).collect()[0][0]


def test_residual_quantizes_tighter_than_raw(pq_index, pq_index_raw, spark, emb):
    """The point of residual encoding (Jégou et al. 2011 §IV): the
    codebook covers x - coarse_centroid(x), a distribution concentrated
    around zero, so the per-vector reconstruction error must come out
    LOWER than quantizing raw vectors at the same m_sub/k_codes budget.
    (Recall@k on 500 near-saturated test vectors is dominated by the
    identical coarse pruning and flips on single-rank noise, so the
    error — the mechanism recall rides on — is what's asserted hard;
    recall itself gets a no-collapse floor below.)"""
    res = _pq_reconstruction_mse(spark, emb, pq_index)
    raw = _pq_reconstruction_mse(spark, emb, pq_index_raw)
    assert res < raw, (res, raw)


def test_residual_recall_no_collapse(pq_index, pq_index_raw, spark, emb):
    """Residual ADC must stay within one hit per query of the raw
    layout on the fixture (deterministic data and training — this is a
    fixed-number regression lock, not a statistical bound)."""
    res = _recall_at5(spark, emb, pq_index)
    raw = _recall_at5(spark, emb, pq_index_raw)
    assert res >= raw - 8, (res, raw)
    assert res >= 8  # sanity: far above chance for 8 queries x top-5


def test_rerank_with_full_shortlist_equals_exact_topk(pq_index, spark, emb):
    """With every cell probed and rerank >= corpus size, the two-stage
    probe degenerates to exact cosine top-k — stage 2 must recover the
    exact ranking regardless of how lossy stage 1's ADC was."""
    from pyspark.sql import Window

    from audit_star_spark.analytics.ivf_index import probe_pq_rerank
    from audit_star_spark.analytics.similarity import VEC_EXPR, _dot

    q = _self_queries(emb, 4)
    got = sorted(
        map(tuple, probe_pq_rerank(pq_index, q, k=5, rerank=1000, n_probe=8).collect())
    )
    base = emb.select("vec_id", F.expr(VEC_EXPR).alias("vec")).withColumn(
        "norm", F.sqrt(_dot("vec", "vec"))
    )
    qq = q.withColumn("qnorm", F.sqrt(_dot("qvec", "qvec")))
    cos = _dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    want = sorted(
        map(
            tuple,
            base.crossJoin(F.broadcast(qq))
            .select("query_id", "vec_id", cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "rank", "vec_id", F.round("cosine", 9).alias("cosine"))
            .collect(),
        )
    )
    assert got == want and got


def test_rerank_validates_params(pq_index, spark, emb):
    import pytest as _pytest

    from audit_star_spark.analytics.ivf_index import probe_pq_rerank

    with _pytest.raises(ValueError):
        probe_pq_rerank(pq_index, _self_queries(emb, 1), k=10, rerank=5)


# -------------------------------------------------------- OPQ x IVFADC


@pytest.fixture(scope="module")
def pq_index_opq(spark, emb, tmp_path_factory):
    """Residual IVF-PQ with the learned OPQ rotation composed in."""
    from audit_star_spark.analytics.ivf_index import (
        add_pq_codes,
        build_ivf_index,
    )

    d = str(tmp_path_factory.mktemp("ivfpq_opq") / "idx")
    idx = build_ivf_index(emb, d, n_cells=8, iters=1)
    add_pq_codes(idx, emb, m_sub=4, k_codes=16, use_opq=True)
    return idx


def test_opq_index_layout_meta_and_rotation(pq_index_opq, spark):
    import json as _json

    assert os.path.isdir(os.path.join(pq_index_opq.index_dir, "opq_rotation"))
    with open(os.path.join(pq_index_opq.index_dir, "_ivfpq_meta.json")) as f:
        assert _json.load(f)["opq"] is True
    rot = spark.read.parquet(
        os.path.join(pq_index_opq.index_dir, "opq_rotation")
    )
    rows = rot.collect()
    assert len(rows) == 32  # D/2 pairs at dim 64
    for r in rows:
        assert abs(r["c"] ** 2 + r["s"] ** 2 - 1.0) < 1e-12


def test_opq_residual_quantizes_tighter_than_plain_residual(
    pq_index, pq_index_opq, spark, emb
):
    """The composition's point: rotating the residuals before PQ must
    lower reconstruction error vs plain residual encoding at the same
    m_sub/k budget (rotation is an isometry, so errors in rotated and
    original space are directly comparable — the pq.py monotone
    argument applied to residuals)."""
    from audit_star_spark.analytics.pq import _D2, opq_rotate
    from audit_star_spark.analytics.similarity import VEC_EXPR  # noqa: F401

    def mse(idx, rotate):
        cb = spark.read.parquet(os.path.join(idx.index_dir, "pq_codebook"))
        codes = spark.read.parquet(os.path.join(idx.index_dir, "pq_codes"))
        cents = idx.centroids(spark).select(
            "cell_id", F.col("centroid").alias("cvec")
        )
        tgt = (
            idx.assignments(spark)
            .join(F.broadcast(cents), "cell_id")
            .select(
                "vec_id",
                F.expr("zip_with(vec, cvec, (x, y) -> x - y)").alias("t"),
            )
        )
        if rotate:
            rot = spark.read.parquet(
                os.path.join(idx.index_dir, "opq_rotation")
            )
            tgt = opq_rotate(tgt, rot, 64, vec_col="t")
        w = 64 // 4
        sub = tgt.select(
            "vec_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, 3), s -> named_struct("
                    f"'sub_id', s, 'sv', slice(t, s * {w} + 1, {w})))"
                )
            ).alias("x"),
        ).select(
            "vec_id",
            F.col("x.sub_id").alias("sub_id"),
            F.col("x.sv").alias("sv"),
        )
        joined = (
            sub.join(
                codes.select(
                    "vec_id", F.posexplode("codes").alias("sub_id", "code")
                ),
                ["vec_id", "sub_id"],
            )
            .join(
                F.broadcast(
                    cb.select(
                        "sub_id", F.col("cell_id").alias("code"), "centroid"
                    )
                ),
                ["sub_id", "code"],
            )
        )
        return (
            joined.select(F.expr(_D2.format(a="sv", b="centroid")).alias("e"))
            .agg(F.avg("e"))
            .collect()[0][0]
        )

    plain = mse(pq_index, rotate=False)
    opq = mse(pq_index_opq, rotate=True)
    assert opq <= plain
    assert opq < plain * 0.9999  # actually learned, not degenerate


def test_opq_probe_ranks_against_rotated_codes(pq_index_opq, spark, emb):
    """probe_pq on an OPQ index must rotate the query residual before
    tabulating — recall must clear the same no-collapse floor as the
    plain residual index (exact self-match at rank 1 for every query
    vector that lives in a probed cell)."""
    from audit_star_spark.analytics.ivf_index import probe_pq
    from audit_star_spark.analytics.similarity import VEC_EXPR

    base = emb.select("vec_id", F.expr(VEC_EXPR).alias("vec"))
    queries = base.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    out = probe_pq(pq_index_opq, queries, k=5, n_probe=8)  # all cells
    rows = {(r["query_id"], r["rank"]): r["vec_id"] for r in out.collect()}
    # with every cell probed, ADC of the query against ITS OWN code is
    # the quantization floor; the self vector must appear in the top-5
    tops = {q: [rows[q, r] for r in range(1, 6)] for q in range(6)}
    assert all(q in tops[q] for q in range(6))


def test_opq_streaming_codes_match_batch_encode(
    pq_index_opq, spark, emb, tmp_path
):
    """Streamed vectors ingested against an OPQ index must earn the
    SAME codes the batch path would give them (rotate-then-encode with
    the persisted artifacts) — bit parity."""
    from audit_star_spark.streaming.ivf import StreamingIVFIngest

    s = StreamingIVFIngest(pq_index_opq.index_dir, str(tmp_path / "store"))
    batch = emb.filter(F.col("vec_id") < 40)
    s.process_batch(batch, 0)
    streamed = {
        r["vec_id"]: list(r["codes"])
        for r in spark.read.parquet(s.pq_store_dir).collect()
    }
    want = {
        r["vec_id"]: list(r["codes"])
        for r in spark.read.parquet(
            os.path.join(pq_index_opq.index_dir, "pq_codes")
        )
        .filter(F.col("vec_id") < 40)
        .collect()
    }
    assert streamed == want


def test_bitext_mine_from_persisted_index(index, spark, emb):
    """bitext_mine(index=...) mines straight off the persisted
    assignments — same pairs as running the mining core over an inline
    assignment from the SAME persisted centroids, zero training jobs."""
    from audit_star_spark.analytics.similarity import (
        _bitext_mine_from_assigned,
        _sided_assignment,
        bitext_mine,
        with_norm,
        VEC_EXPR,
    )

    got = sorted(
        map(
            tuple,
            bitext_mine(emb, k=3, threshold=0.8, index=index).collect(),
        )
    )
    cents = index.centroids(spark).select(
        "cell_id",
        F.col("centroid").alias("cvec"),
        F.col("cnorm").alias("cnorm"),
    )
    base = with_norm(
        emb.withColumn("side", F.col("label") % 2).select(
            "vec_id", "side", F.expr(VEC_EXPR).alias("vec")
        )
    )
    want = sorted(
        map(
            tuple,
            _bitext_mine_from_assigned(
                _sided_assignment(base, cents), 3, 0.8
            ).collect(),
        )
    )
    assert got == want and got
