"""PCA over the embedding corpus — top principal component by power
iteration, as pure DataFrame algebra.

The corpus-analysis questions this answers are standard embedding-ops
fare: is there a dominant direction (anisotropy — common in LM
embeddings, Mu & Viswanath 2018 "All-but-the-Top"), how much variance
it explains, and each dimension's loading (the direction to subtract
for whitening, or to keep for a 1-D diagnostic projection).

Why power iteration and not eigh/SVD: a fixed number of matrix-vector
products from a deterministic start uses only +,-,*,/ and sqrt — the
same bit-portability argument as the OPQ Givens rotation — so the
DuckDB oracle replays the whole computation, which no library
eigensolver allows.

Scale shape:
- the covariance accumulates ONE D^2-row table: vectors explode to
  (i, j, x_i*x_j) triples through two chained posexplodes (generator-
  pipelined, whole-stage codegen — measured 4.6x over the interpreted
  transform/flatten higher-order explode) and reduce per (i, j).
- ``bit_exact`` switches the corpus-sized reductions (per-dimension
  mean, per-(i, j) product sum — group size N) between the gate's
  ascending-order sum — STREAMED: repartition by group key + in-
  partition sort by value + plain SUM accumulates in exactly the
  array_sort order, bit-identical to the DuckDB sorted fold with an
  O(1) aggregation buffer and a spillable sort instead of an O(N)
  ``collect_list`` buffer per group (tests/test_folds_parity.py pins
  value equality against the fold expression and the plan shape) —
  and production plain ``SUM`` (map-side partials, no repartition, the
  cheapest form at 100 TB). Both agree to 1e-9 on the parity fixture;
  the driver gate keeps the default True.
- the power-iteration / deflation loop runs ON THE DRIVER over the
  collected covariance: the matrix is D^2-bounded (dimension, not
  corpus — 64x64 here, the same object the old per-round joins shipped
  through the cluster 8 times), so the fixed-point loop is 64-row
  algebra that was costing ~25 scheduled jobs per extraction. The
  arithmetic replays the previous DataFrame loop op-for-op (sorted
  D-row folds — Python floats are the same IEEE-754 binary64), so
  results are bit-identical; only corpus-sized work stays distributed.

Sign convention: eigenvectors are sign-ambiguous; the loading of
dimension 0 is forced non-negative (flip all if negative) so both
engines agree byte-for-byte.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.similarity import VEC_EXPR, _vec_dim
from audit_star_spark.functions.folds import fold_sum, sorted_stream_sum
from audit_star_spark.plans.iterate import iter_materialize


def _mean_row(base: DataFrame, n: int, bit_exact: bool) -> DataFrame:
    """ONE-row frame with ``ml``: the per-dimension corpus mean as an
    array (dimension-major). The corpus-sized per-dimension sum honors
    ``bit_exact``; the D-row array reassembly is bounded."""
    exploded = base.select(F.posexplode("vec").alias("i", "x"))
    if bit_exact:
        summed = sorted_stream_sum(exploded, ["i"], "x", "__s")
    else:
        summed = exploded.groupBy("i").agg(
            F.expr(fold_sum("x", False)).alias("__s")
        )
    return summed.select(
        "i", (F.col("__s") / F.lit(float(n))).alias("m")
    ).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(i, m))), x -> x.m)"
        ).alias("ml")
    )


def _cov_from_base(
    base: DataFrame, dim: int, n: int, mean_row: DataFrame, bit_exact: bool
) -> DataFrame:
    """(i, j, c) biased (/N) covariance from a pre-shaped (vec_id, vec)
    frame and its one-row mean — the shared core, so callers that
    already paid for the mean (embedding_whiten) reuse it instead of a
    second full corpus pass."""
    centered = base.crossJoin(F.broadcast(mean_row)).select(
        "vec_id",
        F.expr("zip_with(vec, ml, (x, m) -> x - m)").alias("cv"),
    )
    # upper triangle only (i <= j), mirrored after aggregation: the
    # product multisets of (i, j) and (j, i) are identical, so the
    # mirror is BIT-identical to computing both — at half the explode
    # and fold work (D(D+1)/2 instead of D^2 rows per vector). Two
    # chained posexplodes (position i, then the tail slice from i)
    # stream through codegen; the previous transform/flatten/
    # named_struct explode was interpreted HOF evaluation, measured
    # 4.6x slower at sf0.1.
    pairs = (
        centered.select(F.posexplode("cv").alias("i", "x"), "cv")
        .select(
            "i",
            "x",
            F.posexplode(F.expr(f"slice(cv, i + 1, {dim})")).alias("dj", "y"),
        )
        .select(
            "i",
            (F.col("i") + F.col("dj")).alias("j"),
            (F.col("x") * F.col("y")).alias("v"),
        )
    )
    if bit_exact:
        summed = sorted_stream_sum(pairs, ["i", "j"], "v", "__s")
    else:
        summed = pairs.groupBy("i", "j").agg(
            F.expr(fold_sum("v", False)).alias("__s")
        )
    upper = summed.select(
        "i", "j", (F.col("__s") / F.lit(float(n))).alias("c")
    )
    return upper.unionByName(
        upper.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "c"
        )
    )


def covariance_table(
    emb: DataFrame, dim: int | None = None, bit_exact: bool = True
) -> DataFrame:
    """(i, j, c): the (biased, /N) covariance of the embedding corpus —
    centered with the per-dimension mean. ``bit_exact=True`` (gate)
    folds both corpus-sized passes in sorted order for oracle
    bit-parity; ``False`` (production) uses plain map-side-combinable
    SUM so group buffers are O(1) in corpus size."""
    dim = dim or _vec_dim(emb)
    base = emb.select("vec_id", F.expr(VEC_EXPR).alias("vec"))
    n = base.count()
    if n == 0:
        raise ValueError("empty embedding corpus")
    return _cov_from_base(base, dim, n, _mean_row(base, n, bit_exact), bit_exact)


def _ssum(values) -> float:
    """The sorted fold, driver-side: IEEE-754 binary64 sum in ascending
    order — op-for-op what the SORTED_FOLD expression (and the DuckDB
    oracle's list_sort fold) computes; Python floats ARE doubles."""
    s = 0.0
    for x in sorted(values):
        s += x
    return s


def _collect_cov(cov: DataFrame) -> dict[tuple[int, int], float]:
    """Collect a (i, j, c) matrix frame to a driver dict — D^2-bounded
    (dimension, not corpus): the bounded-control-read convention of the
    k-means shift probe, not a data collect."""
    return {(r["i"], r["j"]): r["c"] for r in cov.collect()}


def _power_top_local(
    cov: dict[tuple[int, int], float], dim: int, n_iter: int
) -> tuple[list[float], float]:
    """One top-eigenpair extraction from a collected matrix dict:
    (loadings list, eigenvalue). Sign pinned via dim 0 non-negative.
    Replays the arithmetic of the former DataFrame loop exactly
    (sorted D-row folds, same operand order) — the loop is 64-row
    algebra that previously cost ~25 scheduled Spark jobs per
    extraction."""
    v = [1.0 / math.sqrt(float(dim))] * dim
    for _ in range(n_iter):
        w = [
            _ssum([cov[(i, j)] * v[j] for j in range(dim)])
            for i in range(dim)
        ]
        nrm = math.sqrt(_ssum([x * x for x in w]))
        v = [x / nrm for x in w]
    sg = -1.0 if v[0] < 0 else 1.0
    loadings = [x * sg for x in v]
    cv = [
        _ssum([cov[(i, j)] * loadings[j] for j in range(dim)])
        for i in range(dim)
    ]
    eig = _ssum([cv[i] * loadings[i] for i in range(dim)])
    return loadings, eig


def pca_top_component(
    emb: DataFrame, n_iter: int = 8, bit_exact: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(loadings (dim, loading), stats (eigenvalue, trace, var_share) —
    one row). ``n_iter`` power-iteration steps from the uniform start
    1/sqrt(D); the final Rayleigh quotient v'Cv is the eigenvalue
    estimate and var_share = eigenvalue / trace(C)."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    dim = _vec_dim(emb)
    # ONE distributed reduction (the covariance), then driver-side
    # 64-row algebra over the collected D^2-bounded matrix
    cov = _collect_cov(covariance_table(emb, dim, bit_exact=bit_exact))
    spark = emb.sparkSession
    loadings, eig = _power_top_local(cov, dim, n_iter)
    trace = _ssum([cov[(i, i)] for i in range(dim)])
    ldf = spark.createDataFrame(
        list(enumerate(loadings)), "dim int, loading double"
    )
    stats = spark.createDataFrame(
        [(eig, trace, eig / trace)],
        "eigenvalue double, trace double, var_share double",
    )
    return ldf, stats


def _components_from_cov(
    spark, cov: DataFrame, dim: int, k: int, n_iter: int
) -> DataFrame:
    """Hotelling deflation over a (i, j, c) covariance frame — shared
    by pca_components and embedding_whiten (which already owns the
    covariance). The matrix is collected once (D^2-bounded) and the
    k extractions + deflations run driver-side with the exact former
    arithmetic (deflation: c - ((eigenvalue * v_i) * v_j), the same
    left-associated operand order). Returns (comp 1-based, dim,
    loading, eigenvalue, var_share)."""
    m = _collect_cov(cov)
    trace = _ssum([m[(i, i)] for i in range(dim)])
    rows = []
    for comp in range(1, k + 1):
        loadings, eig = _power_top_local(m, dim, n_iter)
        rows.extend(
            (comp, i, loadings[i], eig, eig / trace) for i in range(dim)
        )
        if comp < k:
            m = {
                (i, j): c - ((eig * loadings[i]) * loadings[j])
                for (i, j), c in m.items()
            }
    return spark.createDataFrame(
        rows,
        "comp int, dim int, loading double, eigenvalue double, "
        "var_share double",
    )


def pca_components(
    emb: DataFrame, k: int = 2, n_iter: int = 8, bit_exact: bool = True
) -> DataFrame:
    """Top-``k`` principal components by HOTELLING DEFLATION — extract
    the top eigenpair, subtract ``lambda * v v'`` from the matrix frame
    (a D-row self-join, closed form), repeat. The "All-but-the-Top"
    recipe (Mu & Viswanath 2018) removes exactly these components to
    whiten LM embeddings; the per-component variance shares are the
    anisotropy report. Returns (comp 1-based, dim, loading,
    eigenvalue, var_share) — k*D rows.

    Same scale/portability shape as the top component: constant-size
    loop bodies over the materialized D^2 matrix frame, +,-,*,/,sqrt
    only, so the oracle replays every component including the
    deflation arithmetic. ``bit_exact`` governs only the corpus-sized
    covariance folds (module docstring)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    dim = _vec_dim(emb)
    if k > dim:
        raise ValueError(f"k {k} exceeds dim {dim}")
    cov = covariance_table(emb, dim, bit_exact=bit_exact)
    return _components_from_cov(emb.sparkSession, cov, dim, k, n_iter)


def embedding_pca_report(
    emb: DataFrame, n_iter: int = 8, bit_exact: bool = True
) -> DataFrame:
    """Per-dimension report: (dim, loading, var_share) with the top
    component's explained-variance share repeated on every row (a
    constant column keeps the result one hash-checkable frame)."""
    loadings, stats = pca_top_component(emb, n_iter, bit_exact=bit_exact)
    return loadings.crossJoin(F.broadcast(stats.select("var_share"))).select(
        "dim",
        F.round("loading", 9).alias("loading"),
        F.round("var_share", 9).alias("var_share"),
    )


def embedding_whiten(
    emb: DataFrame, k: int = 1, n_iter: int = 8, bit_exact: bool = True
) -> DataFrame:
    """All-but-the-Top whitening APPLIED (Mu & Viswanath 2018): return
    (vec_id, embedding) with the mean and the projections onto the top
    ``k`` principal components removed —

        x' = (x - m) - sum_i (v_i . (x - m)) v_i

    the standard post-processing that makes LM embeddings usable for
    cosine retrieval. The covariance of the output IS the k-times
    deflated matrix, so its top component equals component k+1 of the
    input (the identity pca_components' deflation tests pin).

    Scale shape: the corpus mean is computed ONCE (one pass + one
    count) and reused by both the covariance and the final rewrite —
    the 1-row mean frame is materialized so the second broadcast does
    not replay the pass. The k loading vectors and the mean collapse
    into ONE broadcast row of small arrays; the rewrite is a single
    in-row expression over the corpus — no shuffle, no per-vector
    joins."""
    dim = _vec_dim(emb)
    if k > dim:
        raise ValueError(f"k {k} exceeds dim {dim}")
    base = emb.select("vec_id", F.expr(VEC_EXPR).alias("vec"))
    n = base.count()
    if n == 0:
        raise ValueError("empty embedding corpus")
    # one corpus pass for the mean, shared by the covariance and the
    # rewrite below (1-row frame — materialization truncates lineage so
    # the second broadcast is free)
    mean = iter_materialize(_mean_row(base, n, bit_exact))
    cov = _cov_from_base(base, dim, n, mean, bit_exact)
    comps = _components_from_cov(emb.sparkSession, cov, dim, k, n_iter)
    # flatten the k loading vectors into one broadcastable array of
    # k * dim doubles, component-major
    lmat = comps.select("comp", "dim", "loading").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(comp, dim, loading))), "
            "x -> x.loading)"
        ).alias("ll")
    )
    # two in-row steps: center once, take the k projections once
    # (O(k*D) per vector), then subtract — never O(k*D^2)
    dots = (
        f"transform(sequence(1, {k}), c -> "
        f"aggregate(zip_with(cvec, slice(ll, (c - 1) * {dim} + 1, {dim}), "
        f"(x, v) -> x * v), CAST(0.0 AS DOUBLE), (s, v) -> s + v))"
    )
    rewrite = (
        f"transform(sequence(1, {dim}), d -> "
        f"element_at(cvec, d) - "
        f"aggregate(sequence(1, {k}), CAST(0.0 AS DOUBLE), (acc, c) -> "
        f"acc + element_at(dots, c) * element_at(ll, (c - 1) * {dim} + d)))"
    )
    return (
        base.crossJoin(F.broadcast(mean))
        .crossJoin(F.broadcast(lmat))
        .select(
            "vec_id",
            F.expr("zip_with(vec, ml, (x, m) -> x - m)").alias("cvec"),
            F.col("ll").alias("ll"),
        )
        .select("vec_id", "cvec", "ll", F.expr(dots).alias("dots"))
        .select("vec_id", F.expr(rewrite).alias("embedding"))
    )
