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

PQ_M_SUB = 4
PQ_K = 16


def _base(emb: DataFrame) -> DataFrame:
    return emb.select("vec_id", F.expr(VEC_EXPR).alias("vec"))


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


def _assign(sub: DataFrame, codebook: DataFrame) -> DataFrame:
    """Per (vec_id, sub_id): the L2-nearest codeword (ties to the
    smaller cell_id). codebook = (sub_id, cell_id, centroid)."""
    scored = sub.join(F.broadcast(codebook), "sub_id").select(
        "vec_id",
        "sub_id",
        "svec",
        "cell_id",
        F.expr(_D2.format(a="svec", b="centroid")).alias("d2"),
    )
    w = Window.partitionBy("vec_id", "sub_id").orderBy("d2", "cell_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "sub_id", "svec", "cell_id")
    )


def pq_train(
    emb: DataFrame, m_sub: int = PQ_M_SUB, k: int = PQ_K, iters: int = 1
) -> DataFrame:
    """Per-subspace codebooks: (sub_id, cell_id, n_members, centroid).
    Seeds are the first k vec_ids' slices; each iteration is one
    distributed Lloyd round (assign by broadcast argmin, re-mean by
    sorted (sub, cell, dim) folds). Empty cells vanish — exactly the
    kmeans_update semantics, per subspace."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    base = _base(emb)
    dim = _vec_dim(emb)
    sub = _subvecs(base, dim, m_sub)
    codebook = sub.filter(F.col("vec_id") < k).select(
        "sub_id", F.col("vec_id").alias("cell_id"), F.col("svec").alias("centroid")
    )
    for _ in range(iters):
        assigned = _assign(sub, codebook)
        sums = (
            assigned.select(
                "sub_id", "cell_id", F.posexplode("svec").alias("pos", "x")
            )
            .groupBy("sub_id", "cell_id", "pos")
            .agg(
                F.expr(
                    "aggregate(array_sort(collect_list(x)), "
                    "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
                ).alias("s"),
                F.count("*").alias("n"),
            )
        )
        codebook = (
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
    return codebook


def pq_encode(
    emb: DataFrame, codebook: DataFrame, m_sub: int = PQ_M_SUB
) -> DataFrame:
    """(vec_id, codes array<int>): the m_sub nearest-codeword ids in
    subspace order — the compressed representation (log2(k) bits per
    subspace at storage time; ints here)."""
    base = _base(emb)
    sub = _subvecs(base, _vec_dim(emb), m_sub)
    return (
        _assign(sub, codebook.select("sub_id", "cell_id", "centroid"))
        .groupBy("vec_id")
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
