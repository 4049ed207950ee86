"""Product quantization for billion-scale ANN (Jégou, Douze & Schmid
2011, "Product Quantization for Nearest Neighbor Search" — the PQ in
FAISS's IVF-PQ, the standard 100 TB vector-search layout).

A D-dim vector is split into ``m_sub`` subvectors; each subspace gets
its own small codebook (k-means over that slice), and a vector is
stored as ``m_sub`` small integer codes — 64 floats become 4 bytes at
m_sub=4/k=16. Search uses ASYMMETRIC distance (ADC): the query stays
exact, and its squared-L2 distance to every codeword of every subspace
is tabulated ONCE (an m_sub x k table); a database vector's
approximate distance is then just ``sum_m table[m][code[m]]`` — table
lookups, no float vector math per candidate.

Spark shapes:
- training/encoding explode rows into (vec_id, sub_id, subvec) and
  assign by broadcast-join argmin — no corpus shuffle, same plan as
  the IVF coarse quantizer;
- the ADC scan joins the (vec_id, sub_id, code) rows against the
  BROADCAST per-query distance table and sum-aggregates — shuffle
  volume is m_sub rows per vector of 3 ints + 1 double, not vectors;
- every float reduction is either an in-row fold over a fixed-order
  array or a sorted fold over collected partials (the repo's
  bit-determinism rule), so a DuckDB oracle reproduces codebooks,
  codes, distances and therefore recalls exactly.

One Lloyd round from the deterministic first-k seed is the
oracle-checkable training unit (the kmeans_update convention);
``iters`` extends it driver-side like kmeans_train.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from audit_star_spark.analytics.similarity import VEC_EXPR, _vec_dim
from audit_star_spark.functions.folds import fold_sum
from audit_star_spark.plans.iterate import iter_materialize

PQ_M_SUB = 4
PQ_K = 16


def _base(emb: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
    return emb.select("vec_id", *extra, F.expr(VEC_EXPR).alias("vec"))


def _subvecs(df: DataFrame, dim: int, m_sub: int, vec_col: str = "vec") -> DataFrame:
    """(.., sub_id, svec): the m_sub contiguous slices of the vector."""
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    w = dim // m_sub
    return df.select(
        "*",
        F.explode(
            F.expr(
                f"transform(sequence(0, {m_sub - 1}), "
                f"s -> named_struct('sub_id', s, "
                f"'svec', slice({vec_col}, s * {w} + 1, {w})))"
            )
        ).alias("__sub"),
    ).select(
        *[c for c in df.columns],
        F.col("__sub.sub_id").alias("sub_id"),
        F.col("__sub.svec").alias("svec"),
    )


_D2 = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
)


# in-row argmin over one subspace's packed codebook: score every codeword
# once (transform), fold keeping the STRICTLY smaller distance — ties
# keep the running best, and the array is cell_id-ascending, so equal
# distances resolve to the smaller cell_id: exactly the (d2, cell_id)
# row_number semantics this replaces. The squared-L2 arithmetic is the
# _D2 expression verbatim, so distances are bit-identical.
_BEST_CODE = (
    "aggregate("
    "transform(__cells, c -> named_struct("
    "'s', aggregate(zip_with(svec, c.centroid, (x, y) -> (x - y) * (x - y)), "
    "CAST(0.0 AS DOUBLE), (s, v) -> s + v), "
    "'c', c.cell_id)), "
    "named_struct('s', CAST('Infinity' AS DOUBLE), 'c', CAST(-1 AS BIGINT)), "
    "(acc, x) -> CASE WHEN x.s < acc.s THEN x ELSE acc END).c"
)


def _assign(
    sub: DataFrame, codebook: DataFrame, extra: tuple[str, ...] = ()
) -> DataFrame:
    """Per (vec_id, sub_id): the L2-nearest codeword (ties to the
    smaller cell_id), as ONE in-row argmin per subvector over that
    subspace's broadcast cell_id-sorted codeword array — no explode
    join, no per-(vec_id, sub_id) window, NO exchange of the corpus
    side (the previous shape shuffled corpus x k scored rows through a
    window sort just to pick each argmin).
    codebook = (sub_id, cell_id, centroid). ``extra`` columns of ``sub``
    ride through (payload passthrough — so callers never re-join the
    corpus to recover them)."""
    packed = codebook.groupBy("sub_id").agg(
        F.expr("array_sort(collect_list(struct(cell_id, centroid)))").alias(
            "__cells"
        )
    )
    return sub.join(F.broadcast(packed), "sub_id").select(
        "vec_id",
        *extra,
        "sub_id",
        "svec",
        F.expr(_BEST_CODE).alias("cell_id"),
    )


def pq_train(
    emb: DataFrame,
    m_sub: int = PQ_M_SUB,
    k: int = PQ_K,
    iters: int = 1,
    bit_exact: bool = True,
) -> DataFrame:
    """Per-subspace codebooks: (sub_id, cell_id, n_members, centroid).
    Seeds are the first k vec_ids' slices; each iteration is one
    distributed Lloyd round (assign by broadcast argmin, re-mean from
    the assignments). The re-mean group is cell occupancy (~corpus/k),
    so ``bit_exact`` picks the gate's sorted fold (oracle bit-parity,
    O(group) buffers) or production plain SUM (map-side combinable,
    O(1) buffers — functions/folds.py). Empty cells vanish — exactly
    the kmeans_update semantics, per subspace."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    base = _base(emb)
    dim = _vec_dim(emb)
    sub = _subvecs(base, dim, m_sub)
    codebook = sub.filter(F.col("vec_id") < k).select(
        "sub_id", F.col("vec_id").alias("cell_id"), F.col("svec").alias("centroid")
    )
    for _ in range(iters):
        # materialize each round's BOUNDED codebook (m_sub x k rows):
        # every downstream consumer (encode, ADC table, the next Lloyd
        # round) otherwise re-plans AND re-executes the whole training
        # subtree per reference — the opq_recall physical plan was 391k
        # chars of duplicated training subtrees before this truncation
        codebook = iter_materialize(
            _lloyd_round(sub, codebook, bit_exact=bit_exact)
        )
    return codebook


def _lloyd_round(
    sub: DataFrame, codebook: DataFrame, bit_exact: bool = True
) -> DataFrame:
    """One distributed Lloyd round per subspace: broadcast-argmin
    assignment against ``codebook``, then centroids re-mean from the
    assignments (sorted (sub, cell, dim) folds for bit-stable means).
    Empty cells vanish — the kmeans_update semantics, per subspace.
    Monotone: for a FIXED assignment the mean minimizes within-cell
    SSE, so quantization error never rises across a round."""
    assigned = _assign(sub, codebook.select("sub_id", "cell_id", "centroid"))
    sums = (
        assigned.select(
            "sub_id", "cell_id", F.posexplode("svec").alias("pos", "x")
        )
        .groupBy("sub_id", "cell_id", "pos")
        .agg(
            F.expr(fold_sum("x", bit_exact)).alias("s"),
            F.count("*").alias("n"),
        )
    )
    return (
        sums.select(
            "sub_id",
            "cell_id",
            "pos",
            (F.col("s") / F.col("n")).alias("m"),
            "n",
        )
        .groupBy("sub_id", "cell_id")
        .agg(
            F.max("n").cast("long").alias("n_members"),
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), x -> x.m)"
            ).alias("centroid"),
        )
    )


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    m_sub: int = PQ_M_SUB,
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """(vec_id, *extra, codes array<int>): the m_sub nearest-codeword
    ids in subspace order — the compressed representation (log2(k) bits
    per subspace at storage time; ints here). ``extra`` columns must be
    functionally dependent on vec_id (e.g. the coarse cell id); they
    join the groupBy key, which leaves the groups identical while
    letting the caller skip a corpus-sized re-join to recover them."""
    base = _base(emb, extra)
    sub = _subvecs(base, _vec_dim(emb), m_sub)
    return (
        _assign(sub, codebook.select("sub_id", "cell_id", "centroid"), extra)
        .groupBy("vec_id", *extra)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(sub_id, cell_id))), "
                "x -> CAST(x.cell_id AS INT))"
            ).alias("codes")
        )
    )


def pq_adc_topk(
    emb: DataFrame,
    codebook: DataFrame,
    codes: DataFrame,
    n_queries: int = 8,
    k_nn: int = 5,
    m_sub: int = PQ_M_SUB,
) -> DataFrame:
    """Asymmetric-distance top-k: (query_id, vec_id, adc, rank). The
    per-query distance table (m_sub x k rows per query) is broadcast;
    candidates never touch float vectors — only their codes. ADC sums
    fold over the SORTED partials for bit-stable totals; ties break to
    the smaller vec_id. Self-matches are kept (the index knows nothing
    about query identity)."""
    base = _base(emb)
    dim = _vec_dim(emb)
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    qsub = _subvecs(
        queries.select("query_id", F.col("qvec").alias("vec")), dim, m_sub
    ).select("query_id", "sub_id", F.col("svec").alias("qsvec"))
    table = qsub.join(codebook.select("sub_id", "cell_id", "centroid"), "sub_id").select(
        "query_id",
        "sub_id",
        "cell_id",
        F.expr(_D2.format(a="qsvec", b="centroid")).alias("pd"),
    )
    exploded = codes.select(
        "vec_id", F.posexplode("codes").alias("sub_id", "cell_id")
    )
    adc = (
        exploded.join(F.broadcast(table), ["sub_id", "cell_id"])
        .groupBy("query_id", "vec_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(pd)), "
                "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
            ).alias("adc")
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_nn)
        .select("query_id", "vec_id", F.round("adc", 9).alias("adc"), "rank")
    )


def pq_recall(
    emb: DataFrame,
    m_sub: int = PQ_M_SUB,
    k: int = PQ_K,
    n_queries: int = 8,
    k_nn: int = 5,
) -> DataFrame:
    """End to end: train -> encode -> ADC top-k, scored against the
    exact L2 top-k — (query_id, n_hits, recall). The 100 TB accounting:
    recall is what the compression costs; the scan only ever touches
    4-code rows."""
    codebook = pq_train(emb, m_sub, k)
    codes = pq_encode(emb, codebook, m_sub)
    approx = pq_adc_topk(emb, codebook, codes, n_queries, k_nn, m_sub)
    base = _base(emb)
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    exact_scored = base.join(F.broadcast(queries)).select(
        "query_id",
        "vec_id",
        F.expr(_D2.format(a="vec", b="qvec")).alias("d2"),
    )
    w = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    exact = (
        exact_scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_nn)
        .select("query_id", "vec_id")
    )
    hits = approx.join(exact, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_hits")
    )
    return (
        queries.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k_nn)), 6
            ).alias("recall"),
        )
    )


# --------------------------------------------------------------- OPQ
# Optimized Product Quantization (Ge, He, Ke & Sun 2013, "Optimized
# Product Quantization for Approximate Nearest Neighbor Search"): learn
# an ORTHOGONAL rotation R so that R·x splits into subspaces that PQ
# quantizes with less error — same code budget, higher recall. The
# paper's non-parametric step solves a full DxD orthogonal Procrustes
# via SVD; SVD is neither SQL-replayable nor bit-portable across
# engines, so this implementation restricts R to a product of DISJOINT
# GIVENS ROTATIONS over a fixed cross-subspace pairing (dim p with
# dim p + D/2 — every pair spans two different PQ subspaces, which is
# where rotation helps: it trades variance BETWEEN subspaces). Each
# 2x2 Procrustes has the closed form
#
#     maximize tr(G·M) over G = [[c, -s], [s, c]], c^2 + s^2 = 1
#     =>  (c, s) = (M11 + M22, M12 - M21) / sqrt(T^2 + W^2)
#
# using only +, -, *, / and sqrt — all IEEE-754 correctly-rounded in
# both the JVM and DuckDB, so the rotation (and everything downstream)
# hash-matches the oracle exactly, which trig or SVD never could.
#
# The alternation is arranged so quantization error is MONOTONE
# non-increasing by construction (the property the OPQ paper proves for
# its alternation, kept provable here step by step):
#   1. train a PQ codebook on x (pq_train);
#   2. reconstruct y = codeword(encode(x)); pick R minimizing
#      sum ||R x - y||^2 over the Givens family (identity is feasible,
#      so the rotated error <= the unrotated error);
#   3. re-encode R x against the SAME codebook (argmin can only lower
#      each vector's error vs keeping the old code);
#   4. one Lloyd re-mean of that assignment (means minimize SSE).
# Queries rotate with the same R at search time; exact L2 is invariant
# under orthogonal R, so ground truth is computed on the originals.


def opq_rotation(
    base: DataFrame,
    codebook: DataFrame,
    dim: int,
    m_sub: int,
    bit_exact: bool = True,
) -> DataFrame:
    """Learn the disjoint-Givens rotation from one PQ reconstruction:
    returns (p, c, s) for each pair (p, p + dim/2), p in [0, dim/2).

    Scale shape: the reconstruction join is the PQ encode plan
    (broadcast codebook, no corpus shuffle); pair statistics are one
    narrow O(N·D/2)-row projection partial-aggregated into D/2 rows.
    The per-pair sums are corpus-sized groups (N values per pair), so
    ``bit_exact`` picks the gate's sorted fold or production plain SUM
    (functions/folds.py)."""
    h = dim // 2
    if dim % 2 != 0:
        raise ValueError(f"dim {dim} must be even for the half pairing")
    w = dim // m_sub
    sub = _subvecs(base, dim, m_sub)
    rec = _assign(sub, codebook.select("sub_id", "cell_id", "centroid")).join(
        F.broadcast(codebook.select("sub_id", "cell_id", "centroid")),
        ["sub_id", "cell_id"],
    )
    dims = rec.select(
        "vec_id",
        F.posexplode(F.arrays_zip("svec", "centroid")).alias("pos", "xy"),
        F.col("sub_id"),
    ).select(
        "vec_id",
        (F.col("sub_id") * w + F.col("pos")).alias("gpos"),
        F.col("xy.svec").alias("x"),
        F.col("xy.centroid").alias("y"),
    )
    lo = dims.filter(F.col("gpos") < h).select(
        "vec_id",
        F.col("gpos").alias("p"),
        F.col("x").alias("xp"),
        F.col("y").alias("yp"),
    )
    hi = dims.filter(F.col("gpos") >= h).select(
        "vec_id",
        (F.col("gpos") - h).alias("p"),
        F.col("x").alias("xq"),
        F.col("y").alias("yq"),
    )
    per_vec = lo.join(hi, ["vec_id", "p"]).select(
        "p",
        (F.col("xp") * F.col("yp") + F.col("xq") * F.col("yq")).alias("t"),
        (F.col("xp") * F.col("yq") - F.col("xq") * F.col("yp")).alias("v"),
    )
    stats = per_vec.groupBy("p").agg(
        F.expr(fold_sum("t", bit_exact)).alias("tt"),
        F.expr(fold_sum("v", bit_exact)).alias("ww"),
    )
    r = F.sqrt(F.col("tt") * F.col("tt") + F.col("ww") * F.col("ww"))
    return stats.select(
        "p",
        F.when(r == 0.0, F.lit(1.0)).otherwise(F.col("tt") / r).alias("c"),
        F.when(r == 0.0, F.lit(0.0)).otherwise(F.col("ww") / r).alias("s"),
    )


def _rot_lists(rot: DataFrame) -> DataFrame:
    """One-row frame (cl, sl): the (c, s) coefficients as arrays indexed
    by pair id — the broadcastable form of the rotation."""
    return rot.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(p, c))), x -> x.c)"
        ).alias("cl"),
        F.expr(
            "transform(array_sort(collect_list(struct(p, s))), x -> x.s)"
        ).alias("sl"),
    )


def opq_rotate(
    df: DataFrame, rot: DataFrame, dim: int, vec_col: str = "vec"
) -> DataFrame:
    """Apply the learned rotation in-row: for pair (p, q = p + dim/2),
    x'_p = c·x_p - s·x_q and x'_q = s·x_p + c·x_q. One broadcast of the
    D/2-pair coefficient row, zero shuffle of the vector side."""
    h = dim // 2
    # element_at is 1-based like DuckDB's list[i] — Spark's arr[i]
    # subscript is 0-based and would silently shift every dimension
    v = f"element_at({vec_col}, %s)"
    c_ = "element_at(cl, %s)"
    s_ = "element_at(sl, %s)"
    rx = (
        f"transform(sequence(1, {dim}), i -> CASE "
        f"WHEN i <= {h} THEN {c_ % 'i'} * {v % 'i'} "
        f"- {s_ % 'i'} * {v % f'i + {h}'} "
        f"ELSE {s_ % f'i - {h}'} * {v % f'i - {h}'} "
        f"+ {c_ % f'i - {h}'} * {v % 'i'} "
        f"END)"
    )
    out_cols = [c for c in df.columns if c != vec_col]
    return (
        df.crossJoin(F.broadcast(_rot_lists(rot)))
        .select(*out_cols, F.expr(rx).alias(vec_col))
    )


def _encode_base(
    base: DataFrame,
    codebook: DataFrame,
    dim: int,
    m_sub: int,
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """pq_encode over a prepared (vec_id, *extra, vec) frame (``extra``
    as in :func:`pq_encode`)."""
    sub = _subvecs(base, dim, m_sub)
    return (
        _assign(sub, codebook.select("sub_id", "cell_id", "centroid"), extra)
        .groupBy("vec_id", *extra)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(sub_id, cell_id))), "
                "x -> CAST(x.cell_id AS INT))"
            ).alias("codes")
        )
    )


def opq_train(
    emb: DataFrame,
    m_sub: int = PQ_M_SUB,
    k: int = PQ_K,
    bit_exact: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """One OPQ alternation: (rotation (p, c, s), codebook trained on the
    rotated vectors). Quantization error of (rotate -> encode) is <= the
    plain pq_train error at the same m_sub/k budget, by the monotone
    construction in the module header."""
    base = _base(emb)
    dim = _vec_dim(emb)
    cb0 = pq_train(emb, m_sub, k, iters=1, bit_exact=bit_exact)
    # rot (D/2 rows) feeds the corpus rotation AND the query rotation;
    # cb1 (m_sub x k rows) feeds the encode AND the ADC table —
    # materialize both bounded frames so neither consumer replays the
    # reconstruction/Lloyd subtrees (plan truncation, same values)
    rot = iter_materialize(
        opq_rotation(base, cb0, dim, m_sub, bit_exact=bit_exact)
    )
    rbase = opq_rotate(base, rot, dim)
    rsub = _subvecs(rbase, dim, m_sub)
    # re-encode vs cb0 + re-mean, one step
    cb1 = iter_materialize(_lloyd_round(rsub, cb0, bit_exact=bit_exact))
    return rot, cb1


def opq_recall(
    emb: DataFrame,
    m_sub: int = PQ_M_SUB,
    k: int = PQ_K,
    n_queries: int = 8,
    k_nn: int = 5,
) -> DataFrame:
    """End to end OPQ: train rotation + rotated codebook -> encode the
    rotated corpus -> rotate each query and rank by asymmetric distance
    -> score against the exact L2 top-k on the ORIGINAL vectors
    (orthogonal rotation preserves L2, so the ground truth is the same
    frame pq_recall uses). Output (query_id, n_hits, recall) —
    hash-checkable like pq_recall."""
    base = _base(emb)
    dim = _vec_dim(emb)
    rot, cb1 = opq_train(emb, m_sub, k)
    rbase = opq_rotate(base, rot, dim)
    codes = _encode_base(rbase, cb1, dim, m_sub)

    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    rqueries = opq_rotate(queries, rot, dim, vec_col="qvec")
    qsub = _subvecs(
        rqueries.select("query_id", F.col("qvec").alias("vec")), dim, m_sub
    ).select("query_id", "sub_id", F.col("svec").alias("qsvec"))
    table = qsub.join(
        cb1.select("sub_id", "cell_id", "centroid"), "sub_id"
    ).select(
        "query_id",
        "sub_id",
        "cell_id",
        F.expr(_D2.format(a="qsvec", b="centroid")).alias("pd"),
    )
    exploded = codes.select(
        "vec_id", F.posexplode("codes").alias("sub_id", "cell_id")
    )
    adc = (
        exploded.join(F.broadcast(table), ["sub_id", "cell_id"])
        .groupBy("query_id", "vec_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(pd)), "
                "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
            ).alias("adc")
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    approx = (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_nn)
        .select("query_id", "vec_id")
    )
    exact_scored = base.join(F.broadcast(queries)).select(
        "query_id",
        "vec_id",
        F.expr(_D2.format(a="vec", b="qvec")).alias("d2"),
    )
    we = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    exact = (
        exact_scored.withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= k_nn)
        .select("query_id", "vec_id")
    )
    hits = approx.join(exact, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_hits")
    )
    return (
        queries.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k_nn)), 6
            ).alias("recall"),
        )
    )
