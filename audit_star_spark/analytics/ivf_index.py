"""Persisted IVF (inverted-file) ANN index: train once, probe many.

The in-line IVF operators (similarity.ivf_topk, semantic_dedup) rebuild
their coarse quantizer on every call — fine for one-shot analytics,
wrong at 100 TB where the corpus is indexed once and then probed by
every downstream retrieval/dedup job for months. This module persists
the two index artifacts to a directory layout that Spark's parquet
source prunes natively:

    <index_dir>/centroids/            (cell_id, n_members, centroid, cnorm)
    <index_dir>/assignments/          (vec_id, label, vec, norm)
        cell_id=0/ cell_id=1/ ...      <- hive PARTITIONED by cell_id
    <index_dir>/_ivf_meta.json        n_cells, iters, dim, n_vectors

Probe path: nearest ``n_probe`` cells per query come from the (tiny,
broadcast) centroid table; the probed cell ids — a bounded
``n_queries x n_probe`` driver-side list, a control decision like the
k-means shift probe — become a partition-column IN filter, so the
assignment scan reads ONLY the probed cells' files (PartitionFilters at
planning time, plan-locked in tests). No k-means job, no full-corpus
scan, no shuffle of the corpus: candidates shrink by ~n_probe/n_cells
exactly as in the in-line operator, but training cost is paid once at
build time.

Centroid training is ``similarity.kmeans_train`` (deterministic Lloyd
from the first-``n_cells`` seed with sorted-fold sums), so a rebuild of
the same corpus bit-reproduces the index — the index-reuse parity tests
rely on this.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from audit_star_spark.analytics.similarity import (
    N_CELLS,
    N_PROBE,
    _assign_to_cells,
    _dot,
    _prepared,
    kmeans_train,
)

META = "_ivf_meta.json"


class IVFIndex:
    """Handle on a persisted IVF index directory (see module docstring).
    Construct via :func:`build_ivf_index` or point at an existing one."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir

    @property
    def _centroids_path(self) -> str:
        return os.path.join(self.index_dir, "centroids")

    @property
    def _assignments_path(self) -> str:
        return os.path.join(self.index_dir, "assignments")

    def meta(self) -> dict:
        with open(os.path.join(self.index_dir, META)) as f:
            return json.load(f)

    def centroids(self, spark) -> DataFrame:
        return spark.read.parquet(self._centroids_path)

    def assignments(self, spark) -> DataFrame:
        return spark.read.parquet(self._assignments_path)

    def probe(
        self,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = N_PROBE,
    ) -> DataFrame:
        """Top-k cosine neighbors for each query against the indexed
        corpus, probing each query's ``n_probe`` nearest cells.

        ``queries``: (query_id, qvec array<double>). Returns
        (query_id, rank, vec_id, cosine); a query's own vec_id is not
        excluded unless the caller filters it (the index knows nothing
        about query identity). NO training runs here: the only corpus
        I/O is the partition-pruned assignment scan.
        """
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        if n_probe <= 0:
            raise ValueError(f"n_probe must be positive, got {n_probe}")
        spark = queries.sparkSession
        probes, probed_cells = _rank_probe_cells(self, queries, n_probe)
        cand = self.assignments(spark).filter(
            F.col("cell_id").isin(probed_cells)
        )
        joined = cand.join(F.broadcast(probes), "cell_id")
        cos = _dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("vec_id")
        )
        out = (
            joined.select("query_id", "vec_id", cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "cosine")
        )
        out = out.localCheckpoint(eager=True)
        probes.unpersist()
        return out


def _rank_probe_cells(
    index: "IVFIndex", queries: DataFrame, n_probe: int
) -> tuple[DataFrame, list[int]]:
    """The shared probe-cell ranking: each query's ``n_probe`` nearest
    cells from the (tiny, broadcast) centroid table. Returns the
    PERSISTED probe frame (query_id, qvec, qnorm, cell_id) — caller
    unpersists — plus the bounded driver-side cell list whose IN
    filter becomes a STATIC partition filter on the index scans
    (PartitionFilters at planning time, plan-locked in tests). Shared
    by probe / probe_pq / probe_pq_rerank so the two-stage path ranks
    and collects exactly once."""
    spark = queries.sparkSession
    q = queries.select(
        "query_id",
        F.col("qvec").alias("qvec"),
        F.sqrt(_dot("qvec", "qvec")).alias("qnorm"),
    )
    cents = index.centroids(spark).select(
        "cell_id",
        F.col("centroid").alias("cvec"),
        F.col("cnorm").alias("cnorm"),
    )
    ccos = _dot("qvec", "cvec") / (F.col("qnorm") * F.col("cnorm"))
    wc = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cell_id")
    )
    probes = (
        q.join(F.broadcast(cents))
        .select("query_id", "qvec", "qnorm", "cell_id", ccos.alias("ccos"))
        .withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "qvec", "qnorm", "cell_id")
    ).persist()
    probed_cells = sorted(
        {
            int(r["cell_id"])
            for r in probes.select("cell_id").distinct().collect()
        }
    )
    return probes, probed_cells


def build_ivf_index(
    emb: DataFrame,
    index_dir: str,
    n_cells: int = N_CELLS,
    iters: int = 3,
) -> IVFIndex:
    """Train the coarse quantizer (deterministic Lloyd, kmeans_train)
    and persist centroids + cell-partitioned assignments. Build cost is
    the k-means run + ONE extra assignment pass with the final
    centroids (kmeans_train's last internal assignment is keyed to the
    second-to-last round's centroids, so it cannot be reused verbatim);
    both are broadcast-join passes over the corpus with no shuffle
    except the tiny (cell, dim) mean aggregate."""
    cents_df, _shifts = kmeans_train(emb, n_cells=n_cells, iters=iters)
    cents = cents_df.withColumn(
        "cnorm", F.sqrt(_dot("centroid", "centroid"))
    )
    os.makedirs(index_dir, exist_ok=True)
    cents.write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))

    spark = emb.sparkSession
    saved = spark.read.parquet(os.path.join(index_dir, "centroids")).select(
        "cell_id",
        F.col("centroid").alias("cvec"),
        "cnorm",
    )
    base = _prepared(emb)
    # label (for downstream consumers — semantic dedup groups on it)
    # rides through the assignment's column passthrough: no corpus-side
    # re-join on vec_id (the join was a second full exchange of the
    # corpus that the old window shape happened to pre-partition for)
    assigned = _assign_to_cells(
        base.select("vec_id", "label", "vec", "norm"), saved
    ).select("vec_id", "label", "vec", "norm", "cell_id")
    # REBALANCE by the partition column before the write (guide §6):
    # without it every scan task writes its own file per cell it holds
    # (tasks x cells tiny files — measured 1000+ at sf0.1 for 2000
    # rows), and every later index read pays the per-file open cost.
    # AQE rebalance is scale-adaptive: small cells coalesce into one
    # file, a skewed giant cell splits across tasks at the advisory
    # partition size instead of funnelling through one writer.
    (
        assigned.hint("rebalance", "cell_id")
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(os.path.join(index_dir, "assignments"))
    )
    # meta from the BOUNDED centroid frame (n_cells rows), not the
    # corpus: every vector lands in exactly one cell, so sum(n_members)
    # IS the corpus count, and centroids are means of the vectors, so
    # their length IS the dimension — this replaces a full corpus scan
    # (count) plus a limit-1 scan (dim probe) with one tiny collect
    stat = (
        spark.read.parquet(os.path.join(index_dir, "centroids"))
        .agg(
            F.coalesce(F.sum("n_members"), F.lit(0)).alias("n"),
            F.max(F.size("centroid")).alias("d"),
        )
        .collect()[0]
    )
    meta = {
        "n_cells": int(n_cells),
        "iters": int(iters),
        "dim": int(stat["d"]) if stat["d"] is not None else 0,
        "n_vectors": int(stat["n"]),
    }
    with open(os.path.join(index_dir, META), "w") as f:
        json.dump(meta, f)
    return IVFIndex(index_dir)


def ivf_topk_trained(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    iters: int = 3,
) -> DataFrame:
    """The one-shot (train-inline, nothing persisted) equivalent of
    build_ivf_index(...).probe(...) with the corpus' own first
    ``n_queries`` vectors as queries and self-matches excluded — the
    retrain reference the index-reuse parity tests compare against, and
    the trained counterpart of similarity.ivf_topk (whose centroids are
    the untrained first-``n_cells`` seed)."""
    cents_df, _ = kmeans_train(emb, n_cells=n_cells, iters=iters)
    cents = cents_df.select(
        "cell_id",
        F.col("centroid").alias("cvec"),
        F.sqrt(_dot("centroid", "centroid")).alias("cnorm"),
    )
    base = _prepared(emb)
    assigned = _assign_to_cells(base.select("vec_id", "vec", "norm"), cents)
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    ccos = _dot("qvec", "cvec") / (F.col("qnorm") * F.col("cnorm"))
    wc = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cell_id")
    )
    probes = (
        q.join(F.broadcast(cents))
        .select("query_id", "qvec", "qnorm", "cell_id", ccos.alias("ccos"))
        .withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "qvec", "qnorm", "cell_id")
    )
    joined = assigned.join(
        F.broadcast(probes),
        (assigned["cell_id"] == probes["cell_id"])
        & (F.col("vec_id") != F.col("query_id")),
    )
    cos = _dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        joined.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


# ------------------------------------------------------------- IVF-PQ

PQ_META = "_ivfpq_meta.json"


def add_pq_codes(
    index: IVFIndex,
    emb: DataFrame,
    m_sub: int = 4,
    k_codes: int = 16,
    by_residual: bool = True,
    iters: int = 1,
    use_opq: bool = False,
) -> None:
    """Extend a built IVF index with product-quantization artifacts
    (the FAISS IVF-PQ layout):

        <index_dir>/pq_codebook/   (sub_id, cell_id, n_members, centroid)
        <index_dir>/pq_codes/      (vec_id, codes array<int>)
            cell_id=0/ ...          <- partitioned by the COARSE cell

    ``by_residual=True`` (default — standard IVFADC, Jégou et al. 2011
    §IV) quantizes ``x - coarse_centroid(cell(x))``: the residual
    distribution each codebook must cover is concentrated around zero,
    which materially raises recall at the same code budget.
    ``by_residual=False`` (FAISS also ships it) quantizes the raw
    vectors; its codes are cell-independent, so a single global
    ADC table ranks them (pq_adc_topk parity). The flag is persisted
    in the PQ meta and drives probe_pq's table construction.

    Codes live under the same hive partitioning as the assignments, so
    a probe prunes code files exactly like vector files — but reads
    m_sub ints per row instead of dim floats (16x smaller at
    64-dim/4-sub).

    ``use_opq=True`` composes the learned OPQ rotation (analytics/pq.py
    — Ge et al. 2013 via closed-form cross-subspace Givens pairs) with
    whichever encoding is selected: the PQ INPUT (residuals under
    IVFADC, raw vectors otherwise) is rotated before codebook training
    and encoding, the rotation persists to <index_dir>/opq_rotation,
    and probe_pq rotates each query('s residual) with the same
    coefficients before tabulating — so the whole R·x quantization is
    transparent to callers and raises recall at the identical code
    budget (the monotone-error argument in pq.py)."""
    from audit_star_spark.analytics.pq import pq_encode, pq_train

    spark = emb.sparkSession
    if by_residual:
        # residuals from the PERSISTED assignments + centroids (the
        # trained artifacts — not a retrain): one broadcast join, no
        # extra shuffle. The residual frame re-uses the `embedding`
        # column name so pq_train/pq_encode's VEC_EXPR cast is a no-op.
        # The coarse cell rides along as __coarse so the partitioned
        # code write never re-joins the corpus to recover it (pq_encode
        # groups on (vec_id, extra) — identical groups, cell_id is
        # functionally dependent on vec_id).
        cents = index.centroids(spark).select(
            "cell_id", F.col("centroid").alias("cvec")
        )
        pq_input = (
            index.assignments(spark)
            .join(F.broadcast(cents), "cell_id")
            .select(
                "vec_id",
                F.col("cell_id").alias("__coarse"),
                F.expr("zip_with(vec, cvec, (x, y) -> x - y)").alias(
                    "embedding"
                ),
            )
        )
        extra = ("__coarse",)
    else:
        pq_input = emb
        extra = ()
    if use_opq:
        from audit_star_spark.analytics.pq import (
            _encode_base,
            _lloyd_round,
            _subvecs,
            opq_rotate,
            opq_rotation,
        )
        from audit_star_spark.analytics.similarity import VEC_EXPR

        dim = index.meta()["dim"]
        base = pq_input.select("vec_id", *extra, F.expr(VEC_EXPR).alias("vec"))
        cb0 = pq_train(pq_input, m_sub=m_sub, k=k_codes, iters=iters)
        opq_rotation(base, cb0, dim, m_sub).write.mode("overwrite").parquet(
            os.path.join(index.index_dir, "opq_rotation")
        )
        rot = spark.read.parquet(
            os.path.join(index.index_dir, "opq_rotation")
        )  # encode with the PERSISTED coefficients, like the codebook
        rotated = opq_rotate(base, rot, dim)
        # re-encode against cb0 + one Lloyd re-mean: the monotone
        # alternation (see pq.py module header)
        codebook = _lloyd_round(_subvecs(rotated, dim, m_sub), cb0)
        codebook.write.mode("overwrite").parquet(
            os.path.join(index.index_dir, "pq_codebook")
        )
        saved_cb = spark.read.parquet(
            os.path.join(index.index_dir, "pq_codebook")
        )
        codes = _encode_base(rotated, saved_cb, dim, m_sub, extra)
    else:
        codebook = pq_train(pq_input, m_sub=m_sub, k=k_codes, iters=iters)
        codebook.write.mode("overwrite").parquet(
            os.path.join(index.index_dir, "pq_codebook")
        )
        saved_cb = spark.read.parquet(
            os.path.join(index.index_dir, "pq_codebook")
        )
        codes = pq_encode(pq_input, saved_cb, m_sub=m_sub, extra=extra)
    if by_residual:
        # the coarse cell rode through the encode: no corpus re-join
        coded = codes.withColumnRenamed("__coarse", "cell_id")
    else:
        coded = codes.join(
            index.assignments(spark).select("vec_id", "cell_id"), "vec_id"
        )
    # same rebalance-before-partitioned-write as build_ivf_index
    (
        coded.hint("rebalance", "cell_id")
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(os.path.join(index.index_dir, "pq_codes"))
    )
    with open(os.path.join(index.index_dir, PQ_META), "w") as f:
        json.dump(
            {
                "m_sub": int(m_sub),
                "k_codes": int(k_codes),
                "by_residual": bool(by_residual),
                "iters": int(iters),
                "opq": bool(use_opq),
            },
            f,
        )


def probe_pq(
    index: IVFIndex,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = N_PROBE,
    extra_codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ probe: coarse cells prune the scan (static partition
    filter, as in IVFIndex.probe), then candidates are ranked by
    ASYMMETRIC distance — the query's exact subvectors against each
    candidate's m_sub codes via the broadcast distance table. The
    corpus' float vectors are never read on this path; only the
    int-code files of the probed cells.

    ``extra_codes`` (vec_id, codes, cell_id) unions additional
    candidates in — the streaming side store's not-yet-merged codes
    (streaming/ivf.py); the static cell filter pushes through the
    union, so both sources stay partition-pruned.

    Residual indexes (PQ meta ``by_residual``, the default) tabulate
    per (query, PROBED CELL): the query residual ``q - centroid(cell)``
    against the codewords — the standard IVFADC per-cell lookup table,
    still only ``n_queries * n_probe * m_sub * k_codes`` rows, built
    from broadcast-sized inputs. Raw indexes use one per-query table.

    Returns (query_id, rank, vec_id, adc); ADC sums fold over sorted
    partials (bit-stable), ties break to the smaller vec_id."""
    probes, probed_cells = _rank_probe_cells(index, queries, n_probe)
    out = _probe_pq_ranked(
        index, queries, k, probes, probed_cells, extra_codes
    )
    probes.unpersist()
    return out


def _probe_pq_ranked(
    index: IVFIndex,
    queries: DataFrame,
    k: int,
    probes: DataFrame,
    probed_cells: list[int],
    extra_codes: DataFrame | None = None,
) -> DataFrame:
    """probe_pq's ADC stage against an already-ranked probe frame —
    split out so probe_pq_rerank ranks the cells (and collects the
    partition-filter list) exactly ONCE for both stages."""
    with open(os.path.join(index.index_dir, PQ_META)) as f:
        pq_meta = json.load(f)
    m_sub = pq_meta["m_sub"]
    by_residual = pq_meta.get("by_residual", False)
    dim = index.meta()["dim"]
    w_sub = dim // m_sub
    spark = queries.sparkSession
    cents = index.centroids(spark).select(
        "cell_id", F.col("centroid").alias("cvec"), "cnorm"
    )

    codebook = spark.read.parquet(
        os.path.join(index.index_dir, "pq_codebook")
    ).select("sub_id", "cell_id", "centroid")

    def _slices(df: DataFrame, vec_col: str, extra: list[str]) -> DataFrame:
        return df.select(
            *extra,
            F.explode(
                F.expr(
                    f"transform(sequence(0, {m_sub - 1}), "
                    f"s -> named_struct('sub_id', s, "
                    f"'qsvec', slice({vec_col}, s * {w_sub} + 1, {w_sub})))"
                )
            ).alias("__s"),
        ).select(
            *extra,
            F.col("__s.sub_id").alias("sub_id"),
            F.col("__s.qsvec").alias("qsvec"),
        )

    pd_expr = F.expr(
        "aggregate(zip_with(qsvec, centroid, (x, y) -> (x - y) * (x - y)), "
        "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    )

    def _maybe_rotate(df: DataFrame, vec_col: str) -> DataFrame:
        # OPQ indexes: the codes live in rotated space, so the query
        # (residual) must rotate with the persisted coefficients before
        # the distance table is built — one broadcast of D/2 rows
        if not pq_meta.get("opq", False):
            return df
        from audit_star_spark.analytics.pq import opq_rotate

        rot = spark.read.parquet(
            os.path.join(index.index_dir, "opq_rotation")
        )
        return opq_rotate(df, rot, dim, vec_col=vec_col)

    if by_residual:
        qres = _maybe_rotate(
            probes.join(
                F.broadcast(cents.select("cell_id", "cvec")), "cell_id"
            ).select(
                "query_id",
                "cell_id",
                F.expr("zip_with(qvec, cvec, (x, y) -> x - y)").alias("rq"),
            ),
            "rq",
        )
        qsub = _slices(qres, "rq", ["query_id", "cell_id"])
        table = qsub.join(codebook.withColumnRenamed("cell_id", "code"), "sub_id").select(
            "query_id", "cell_id", "sub_id", "code", pd_expr.alias("pd")
        )
        table_keys = ["query_id", "cell_id", "sub_id", "code"]
    else:
        qsub = _slices(
            _maybe_rotate(queries.select("query_id", "qvec"), "qvec"),
            "qvec",
            ["query_id"],
        )
        table = qsub.join(codebook.withColumnRenamed("cell_id", "code"), "sub_id").select(
            "query_id", "sub_id", "code", pd_expr.alias("pd")
        )
        table_keys = ["query_id", "sub_id", "code"]

    codes_src = spark.read.parquet(
        os.path.join(index.index_dir, "pq_codes")
    ).select("vec_id", "codes", "cell_id")
    if extra_codes is not None:
        codes_src = codes_src.unionByName(
            extra_codes.select("vec_id", "codes", "cell_id")
        )
    cand = (
        codes_src
        .filter(F.col("cell_id").isin(probed_cells))
        .join(
            F.broadcast(probes.select("query_id", "cell_id")), "cell_id"
        )
        .select(
            "query_id",
            "cell_id",
            "vec_id",
            F.posexplode("codes").alias("sub_id", "code"),
        )
    )
    adc = cand.join(F.broadcast(table), table_keys).groupBy(
        "query_id", "vec_id"
    ).agg(
        F.expr(
            "aggregate(array_sort(collect_list(pd)), "
            "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
        ).alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    out = (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("adc", 9).alias("adc"))
    )
    return out.localCheckpoint(eager=True)


def probe_pq_rerank(
    index: IVFIndex,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 50,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """Two-stage ANN serving — the standard IVF-PQ production pattern
    (FAISS's refine step): stage 1 ranks by compressed ADC over the
    probed cells' int codes (probe_pq — floats never read); stage 2
    re-scores ONLY the top-``rerank`` candidates per query with their
    exact float vectors and exact cosine, recovering the accuracy PQ
    gave up, at the cost of reading ``n_queries * rerank`` vectors
    instead of the corpus.

    Plan shape: the candidate set (<= n_queries * rerank rows of two
    longs) broadcasts into the assignment scan, and the scan itself is
    partition-pruned to the PROBED cells (every shortlist member lives
    in one — re-derived from the broadcast centroid table, no index
    read) — so stage 2 opens n_probe/n_cells of the vector files and
    never shuffles the big side; exact cosine is the bit-stable fold
    idiom, so the re-rank hash-matches the oracle. Returns
    (query_id, rank, vec_id, cosine)."""
    if rerank < k:
        raise ValueError(f"rerank {rerank} must be >= k {k}")
    spark = queries.sparkSession
    # ONE probe-cell ranking + collect serves both stages: the ADC
    # shortlist and the stage-2 vector scan's STATIC partition filter
    # (every shortlist member lives in a probed cell)
    probes, cells = _rank_probe_cells(index, queries, n_probe)
    cand = _probe_pq_ranked(index, queries, rerank, probes, cells).select(
        "query_id", "vec_id"
    )
    probes.unpersist()
    vecs = (
        index.assignments(spark)
        .filter(F.col("cell_id").isin(cells))
        .select("vec_id", "vec", "norm")
    )
    return _rerank_shortlist(cand, queries, vecs, k)


def _rerank_shortlist(
    cand: DataFrame, queries: DataFrame, vecs: DataFrame, k: int
) -> DataFrame:
    """Stage 2 of the two-stage probe: exact-cosine re-score of a
    (query_id, vec_id) shortlist against ``vecs(vec_id, vec, norm)``
    — the shortlist broadcasts into the vector scan, the big side never
    shuffles. Shared by the batch index and the streaming union read."""
    q = queries.select(
        "query_id", "qvec", F.sqrt(_dot("qvec", "qvec")).alias("qnorm")
    )
    cos = _dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        vecs.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 9).alias("cosine"))
    )
