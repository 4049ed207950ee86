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
- the covariance accumulates ONE D^2-row table: vectors explode in-row
  to (i, j, x_i*x_j) triples that partial-aggregate map-side, so the
  shuffle carries D^2 partials per task, never rows.
- ``bit_exact`` switches the corpus-sized reductions (per-dimension
  mean, per-(i, j) product sum — group size N) between the gate's
  sorted fold (bit-identical to the DuckDB oracle, but the
  ``collect_list`` buffer is O(N) per group) and production plain
  ``SUM`` (true algebraic aggregate, O(1) buffers, map-side partials —
  the only form that survives 100 TB). Both paths agree to 1e-9 on the
  parity fixture (tests/test_folds_parity.py); the driver gate keeps
  the default True. The shared switch lives in functions/folds.py.
- the power-iteration / deflation loop is constant-size regardless of
  corpus: every fold there is over a D-row or D^2-row frame (bounded
  by dimension, not corpus), so it stays sorted-fold in BOTH modes —
  bit-determinism is free when groups are O(D).
- every power-iteration step is a join of the broadcast D-row vector
  against the D^2-row covariance and one D-group aggregation —
  driver never sees data, and the loop body is constant-size
  regardless of corpus size.

Sign convention: eigenvectors are sign-ambiguous; the loading of
dimension 0 is forced non-negative (flip all if negative) so both
engines agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.similarity import VEC_EXPR, _vec_dim
from audit_star_spark.functions.folds import SORTED_FOLD, fold_sum
from audit_star_spark.plans.iterate import iter_materialize

_SORTED_SUM = SORTED_FOLD  # bounded-group (O(D)) folds below stay sorted


def _mean_row(base: DataFrame, n: int, bit_exact: bool) -> DataFrame:
    """ONE-row frame with ``ml``: the per-dimension corpus mean as an
    array (dimension-major). The corpus-sized per-dimension sum honors
    ``bit_exact``; the D-row array reassembly is bounded."""
    return (
        base.select(F.posexplode("vec").alias("i", "x"))
        .groupBy("i")
        .agg((F.expr(fold_sum("x", bit_exact)) / F.lit(float(n))).alias("m"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, m))), x -> x.m)"
            ).alias("ml")
        )
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
    # and fold work (D(D+1)/2 instead of D^2 rows per vector)
    pairs = centered.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(0, {dim - 1}), i -> "
                f"transform(sequence(i, {dim - 1}), j -> "
                f"named_struct('i', i, 'j', j, "
                f"'v', element_at(cv, i + 1) * element_at(cv, j + 1)))))"
            )
        ).alias("p")
    ).select(F.col("p.i").alias("i"), F.col("p.j").alias("j"), F.col("p.v").alias("v"))
    upper = pairs.groupBy("i", "j").agg(
        (F.expr(fold_sum("v", bit_exact)) / F.lit(float(n))).alias("c")
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


def _power_top(cov: DataFrame, dim: int, n_iter: int, spark) -> tuple[DataFrame, DataFrame]:
    """One top-eigenpair extraction from a (i, j, c) matrix frame:
    (loadings (dim, loading), eig (eigenvalue) — one row). Sign pinned
    via dim 0 non-negative. All folds here are over D-row groups —
    bounded by dimension, so the sorted fold costs nothing and keeps
    the loop bit-deterministic in both covariance modes."""
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("j"),
        (F.lit(1.0) / F.sqrt(F.lit(float(dim)))).alias("val"),
    )
    for _ in range(n_iter):
        w = (
            cov.join(F.broadcast(v), "j")
            .select("i", (F.col("c") * F.col("val")).alias("cv"))
            .groupBy("i")
            .agg(F.expr(_SORTED_SUM.format("cv")).alias("w"))
        )
        norm = w.agg(
            F.sqrt(F.expr(_SORTED_SUM.format("w * w"))).alias("nrm")
        )
        # per-round truncation: w feeds both the norm and the next
        # round's join — D-row frames, materialization is free
        v = iter_materialize(
            w.crossJoin(F.broadcast(norm))
            .select(F.col("i").alias("j"), (F.col("w") / F.col("nrm")).alias("val"))
        )
    # sign convention: dim 0's loading non-negative
    sign = v.filter(F.col("j") == 0).select(
        F.when(F.col("val") < 0, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("sg")
    )
    loadings = v.crossJoin(F.broadcast(sign)).select(
        F.col("j").alias("dim"), (F.col("val") * F.col("sg")).alias("loading")
    )
    cv = (
        cov.join(F.broadcast(loadings.select(F.col("dim").alias("j"), "loading")), "j")
        .select("i", (F.col("c") * F.col("loading")).alias("cv"))
        .groupBy("i")
        .agg(F.expr(_SORTED_SUM.format("cv")).alias("w"))
    )
    eig = (
        cv.join(
            F.broadcast(loadings.select(F.col("dim").alias("i"), "loading")), "i"
        )
        .agg(F.expr(_SORTED_SUM.format("w * loading")).alias("eigenvalue"))
    )
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
    # materialize once: the D^2-row covariance feeds every iteration
    # (and each round's norm branch forks the DAG) — without truncated
    # lineage Spark re-derives it exponentially, the same blowup the
    # pagerank rounds guard against with iter_materialize
    cov = iter_materialize(covariance_table(emb, dim, bit_exact=bit_exact))
    spark = emb.sparkSession
    loadings, eig = _power_top(cov, dim, n_iter, spark)
    trace = cov.filter(F.col("i") == F.col("j")).agg(
        F.expr(_SORTED_SUM.format("c")).alias("trace")
    )
    stats = eig.crossJoin(F.broadcast(trace)).select(
        "eigenvalue",
        "trace",
        (F.col("eigenvalue") / F.col("trace")).alias("var_share"),
    )
    return loadings, stats


def _components_from_cov(
    spark, cov: DataFrame, dim: int, k: int, n_iter: int
) -> DataFrame:
    """Hotelling deflation over a pre-materialized (i, j, c) frame —
    shared by pca_components and embedding_whiten (which already owns
    the covariance). Returns (comp 1-based, dim, loading, eigenvalue,
    var_share)."""
    trace = cov.filter(F.col("i") == F.col("j")).agg(
        F.expr(_SORTED_SUM.format("c")).alias("trace")
    )
    out = None
    for comp in range(1, k + 1):
        loadings, eig = _power_top(cov, dim, n_iter, spark)
        loadings = iter_materialize(loadings)
        part = (
            loadings.crossJoin(F.broadcast(eig))
            .crossJoin(F.broadcast(trace))
            .select(
                F.lit(comp).alias("comp"),
                "dim",
                "loading",
                "eigenvalue",
                (F.col("eigenvalue") / F.col("trace")).alias("var_share"),
            )
        )
        out = part if out is None else out.unionByName(part)
        if comp < k:
            li = loadings.select(F.col("dim").alias("i"), F.col("loading").alias("vi"))
            lj = loadings.select(F.col("dim").alias("j"), F.col("loading").alias("vj"))
            cov = iter_materialize(
                cov.join(F.broadcast(li), "i")
                .join(F.broadcast(lj), "j")
                .crossJoin(F.broadcast(eig))
                .select(
                    "i",
                    "j",
                    (
                        F.col("c")
                        - F.col("eigenvalue") * F.col("vi") * F.col("vj")
                    ).alias("c"),
                )
            )
    return out


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
    cov = iter_materialize(covariance_table(emb, dim, bit_exact=bit_exact))
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
    cov = iter_materialize(_cov_from_base(base, dim, n, mean, bit_exact))
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
