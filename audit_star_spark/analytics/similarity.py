"""Similarity search over the ``embeddings`` table (north-star layer):

- brute-force cosine top-k (the exact baseline);
- hyperplane-LSH bucketed ANN (the scale path: candidates only within a
  shared sign-pattern bucket — no all-pairs);
- per-label nearest-neighbor (embedding near-dup detection with label
  blocking).

All vector math is built-in higher-order functions (zip_with + sequential
aggregate folds in DOUBLE) — deterministic and identical to a sequential
fold in any engine; no UDFs, no NumPy on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from audit_star_spark.functions.folds import fold_sum

VEC_EXPR = "transform(embedding, x -> CAST(x AS DOUBLE))"


def _dot(a: str, b: str) -> F.Column:
    # sequential fold -> bit-identical to any engine's left fold in double
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    )


def with_norm(df: DataFrame, vec_col: str = "vec", out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.sqrt(_dot(vec_col, vec_col)))


def _prepared(emb: DataFrame) -> DataFrame:
    # spread: a small parquet scan arrives as 1-2 splits, which would
    # serialize every downstream dot-product/bucket stage onto two cores;
    # at real scale the scan has many splits and this is a no-op
    from audit_star_spark.util import spread

    return with_norm(
        spread(emb).select("vec_id", "label", F.expr(VEC_EXPR).alias("vec"))
    )


def _topk_per_query(
    cand: DataFrame, k: int, payload: list[str], keys: list[str] | None = None
) -> DataFrame:
    """Exact per-query top-k by (cosine DESC, vec_id ASC) WITHOUT a
    query-partitioned window: candidates fold into a k-truncated sorted
    array per input partition before any exchange (the explicit
    spark_partition_id grouping key forces map-side truncation), then
    the per-partition winners (<= partitions x queries x k rows)
    re-merge per query. A row_number window over query_id would funnel
    each query's ENTIRE candidate stream through one task — correct for
    cell/bucket-pruned candidate sets (bounded per query), a straggler
    for unpruned brute-force scans, which is where this helper is used.
    Exact: -cosine is an IEEE sign flip and vec_id is unique, so the
    struct's natural order is a total order and merging truncated
    partition arrays equals the global top-k.

    ``cand`` must carry (query_id, vec_id, cosine, *payload); returns
    (query_id, rank, vec_id, *payload, cosine), rank 1 = best.
    ``keys`` widens the per-query grouping (default ``["query_id"]``) —
    e.g. ``["prefix_dim", "query_id"]`` ranks each (prefix, query)
    independently off ONE fused candidate stream.

    NaN guard: a zero-norm vector makes cosine NaN, and NaN's sort
    position differs BETWEEN engines (Spark's ascending sort puts NaN
    last -> excluded; DuckDB's ORDER BY cosine DESC puts NaN first ->
    rank 1). NaN candidates are dropped here and the gate oracles
    mirror the same ``NOT isnan(cosine)`` filter, so both engines agree
    should a degenerate vector ever appear."""
    keys = keys or ["query_id"]
    cand = cand.filter(~F.isnan("cosine"))
    fields = ", ".join(["-cosine AS nc", "vec_id"] + payload + ["cosine"])
    ts = f"struct({fields})"
    local = cand.withColumn("__p", F.spark_partition_id()).groupBy(
        *keys, "__p"
    ).agg(
        F.expr(f"slice(array_sort(collect_list({ts})), 1, {k})").alias("top")
    )
    merged = (
        local.select(*keys, F.explode("top").alias("t"))
        .groupBy(*keys)
        .agg(
            F.expr(f"slice(array_sort(collect_list(t)), 1, {k})").alias("top")
        )
    )
    out = merged.select(*keys, F.posexplode("top").alias("r", "t"))
    cols = [F.col(c) for c in keys]
    cols += [
        (F.col("r") + 1).cast("int").alias("rank"),
        F.col("t.vec_id").alias("vec_id"),
    ]
    cols += [F.col(f"t.{c}").alias(c) for c in payload]
    cols.append(F.col("t.cosine").alias("cosine"))
    return out.select(*cols)


def cosine_topk(emb: DataFrame, n_queries: int = 8, k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for query vectors (vec_id < n_queries).
    Brute force: broadcast the tiny query side against all candidates —
    one scan, no shuffle of the big side until the per-query top-k,
    which is the two-phase partial fold (:func:`_topk_per_query` — no
    query-partitioned window; this is the unpruned full-corpus scan the
    window shape would straggle on)."""
    base = _prepared(emb)
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    joined = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = _dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))
    return _topk_per_query(
        joined.select("query_id", "vec_id", cos.alias("cosine")), k, []
    )


def maxsim_rerank(
    q_tokens: DataFrame,
    d_tokens: DataFrame,
    candidates: DataFrame,
    k: int = 10,
) -> DataFrame:
    """ColBERT-style late-interaction reranking (Khattab & Zaharia
    2020, "ColBERT: Efficient and Effective Passage Search via
    Contextualized Late Interaction"): score(q, d) = sum over query
    tokens of the MAX cosine against any document token — the MaxSim
    operator — computed ONLY over first-stage ``candidates`` pairs.

    Inputs: ``q_tokens`` (query_id, tok_idx, vec array<double>),
    ``d_tokens`` (doc_id, tok_idx, vec), ``candidates``
    (query_id, doc_id). Returns (query_id, rank, doc_id, score6) with
    rank by (score6 DESC, doc_id) — ordering on the 6-dp ROUNDED score
    (the float-portability rule applied to ORDERING).

    Scale shape: candidates come from a first-stage retriever (ANN /
    BM25), so per-query candidate sets are BOUNDED — the rank window
    partitioned by query_id is the documented acceptable case (the
    _topk_per_query funnel caveat applies to UNPRUNED corpus scans,
    not top-n rerank sets). Token joins are equi-joins on doc_id /
    query_id; per-(pair, query-token) MAX is order-free; the one float
    reduction — the sum of per-token maxima — folds in tok_idx order
    (sorted-struct fold), matching the oracle term for term. Zero-norm
    token vectors are dropped on BOTH sides (the NaN ordering guard).
    No all-pairs product anywhere."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    qt = with_norm(
        q_tokens.select(
            "query_id", F.col("tok_idx").alias("q_tok"), F.col("vec").alias("qvec")
        ),
        "qvec",
        "qnorm",
    ).filter(F.col("qnorm") > 0)
    dt = with_norm(
        d_tokens.select(
            "doc_id", F.col("tok_idx").alias("d_tok"), F.col("vec").alias("dvec")
        ),
        "dvec",
        "dnorm",
    ).filter(F.col("dnorm") > 0)
    pairs = candidates.select("query_id", "doc_id").distinct()
    cos = (
        pairs.join(dt, "doc_id")
        .join(qt, "query_id")
        .withColumn(
            "cos", _dot("qvec", "dvec") / (F.col("qnorm") * F.col("dnorm"))
        )
    )
    per_qtok = cos.groupBy("query_id", "doc_id", "q_tok").agg(
        F.max("cos").alias("m")
    )
    scored = per_qtok.groupBy("query_id", "doc_id").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("q_tok", "m"))),
                F.lit(0.0),
                lambda s, x: s + x["m"],
            ),
            6,
        ).alias("score6")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score6").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score6")
    )


def hard_negatives(emb: DataFrame, n_queries: int = 8, k: int = 10) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training (the
    DPR / ANCE recipe — Karpukhin et al. 2020, "Dense Passage
    Retrieval"; Xiong et al. 2021, "Approximate Nearest Neighbor
    Negative Contrastive Learning"): for each query vector (vec_id <
    n_queries, the ivf/knn query convention), the top-k most-cosine-
    similar vectors whose LABEL differs from the query's — the
    near-boundary negatives that make contrastive batches informative
    where random negatives are trivially separable. Same-label vectors
    are positives and excluded (which also excludes the query itself).
    Returns (query_id, query_label, rank, vec_id, neg_label, cosine),
    rank 1 = hardest.

    Scale shape: the bounded query set broadcasts against ONE corpus
    scan (no shuffle of the big side before the per-query top-k), and
    the top-k is TWO-PHASE — per input partition, the candidates fold
    into a k-truncated sorted array BEFORE any exchange (the explicit
    spark_partition_id grouping key is what forces the truncation
    map-side; a bare groupBy(query_id) would ship every candidate),
    then the per-partition winners (<= partitions x n_queries x k rows)
    re-merge per query. A row_number window partitioned by query_id
    would instead funnel each query's ENTIRE different-label corpus
    through one task — the straggler this shape exists to avoid
    (plan-locked: no Window operator). Exact: struct sort on
    (-cosine, vec_id) is total (vec_id unique), so phase-2 of the
    truncated phase-1 arrays equals the global top-k. Mining for a
    full training set = chunk the query set and union; each chunk
    keeps this exact plan."""
    if n_queries < 1 or k < 1:
        raise ValueError(f"n_queries and k must be >= 1, got {n_queries}, {k}")
    base = _prepared(emb)
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    joined = base.join(F.broadcast(q), F.col("label") != F.col("query_label"))
    cos = _dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))
    cand = joined.select(
        "query_id",
        "query_label",
        "vec_id",
        F.col("label").alias("neg_label"),
        cos.alias("cosine"),
    )
    return _topk_per_query(cand, k, ["neg_label", "query_label"]).select(
        "query_id", "query_label", "rank", "vec_id", "neg_label", "cosine"
    )


N_PLANES = 8


def _vec_dim(emb: DataFrame, vec_col: str = "embedding") -> int:
    """Probe the (fixed) embedding dimensionality with a one-row scan at
    plan-build time — LSH planes and IVF cells assume fixed-dim vectors."""
    row = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"]) if row else 0


def _plane_weights(p: int, dim: int) -> str:
    """±1 weight literal for plane p: w(p,d) = parity of the 60-bit md5
    prefix of 'p_d' — the same rule the oracle evaluates in SQL
    (('0x' || substr(md5(p||'_'||d),1,15))::BIGINT % 2)."""
    import hashlib

    ws = [
        "1.0D"
        if int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16) % 2 == 1
        else "-1.0D"
        for d in range(dim)
    ]
    return "array(" + ", ".join(ws) + ")"


def _bucket_expr(vec_col: str, dim: int, planes: range | None = None) -> F.Column:
    """Hyperplane-LSH bucket: bucket bit p is the sign of <w(p), v>.

    The weights depend only on (plane, dim), so they are computed ONCE in
    Python and embedded as array literals — evaluating the md5 inside the
    per-element lambda (the obvious one-expression form) redid the same
    hash rows x planes x dims times and was ~5x the cost of the whole
    operator. Values are identical; the DuckDB oracles are unchanged."""
    terms = []
    for i, p in enumerate(planes if planes is not None else range(N_PLANES)):
        proj = (
            f"aggregate(zip_with({vec_col}, {_plane_weights(p, dim)}, "
            f"(x, w) -> x * w), CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << i} ELSE 0 END)")
    return F.expr(" + ".join(terms)).cast("int")


def lsh_topk(emb: DataFrame, n_queries: int = 8, k: int = 5) -> DataFrame:
    """ANN top-k: candidates limited to the query's LSH bucket, ranked by
    exact cosine. The bucket join replaces the all-pairs product."""
    base = _prepared(emb).withColumn("bucket", _bucket_expr("vec", _vec_dim(emb)))
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    joined = base.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = _dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        joined.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


N_CELLS = 16
N_PROBE = 4


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF-style ANN: a coarse quantizer partitions vectors into cells;
    each query probes only its ``n_probe`` nearest cells and ranks those
    candidates by exact cosine.

    The coarse centroids here are the first ``n_cells`` vectors by vec_id —
    a deterministic stand-in for offline-trained k-means centroids (the
    cell-assignment/probe dataflow is identical either way, which is the
    part that matters at scale: candidates shrink by ~n_probe/n_cells and
    the centroid table is broadcast, never shuffled).
    """
    base = _prepared(emb)
    cents = base.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    # assignment: in-row argmax over the broadcast packed centroids —
    # no corpus exchange (the previous per-vec_id rank window pushed
    # every vector, payload included, through a vec_id-keyed shuffle
    # just to take crank == 1; same fix as _assign_to_cells' callers,
    # r14). Tie-break (ccos desc, cell_id asc) and the score arithmetic
    # are _BEST_CELL's, which restate the window's for every finite
    # cosine (zero-norm caveat at _BEST_CELL_S).
    assigned = _assign_to_cells(base.select("vec_id", "vec", "norm"), cents)
    # probes: top-n_probe cells per QUERY — a window over the bounded
    # n_queries x n_cells frame only
    ccos = _dot("cvec", "vec") / (F.col("cnorm") * F.col("norm"))
    q = base.filter(F.col("vec_id") < n_queries)
    wc = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cell_id"))
    probes = (
        q.join(F.broadcast(cents))
        .select("vec_id", "vec", "norm", "cell_id", ccos.alias("ccos"))
        .withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= n_probe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
            F.col("cell_id").alias("pcell"),
        )
    )
    joined = assigned.join(
        F.broadcast(probes),
        (F.col("cell_id") == F.col("pcell")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = _dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        joined.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


NEAR_BANDS = 2
PLANES_PER_BAND = 4


def embedding_near_pairs(emb: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates must share a
    hyperplane-LSH bucket in at least one of ``NEAR_BANDS`` bands
    (banding trades precision for recall exactly as in MinHash-LSH);
    survivors are verified with exact cosine. No all-pairs product —
    the only wide operation is the per-band bucket self-join.

    At scale the vectors ride through the bucket shuffle (dims ×8 bytes
    per row per band); with very wide embeddings, stage the bucket keys
    to storage and fetch vectors by id instead.
    """
    base = _prepared(emb)
    dim = _vec_dim(emb)
    for b in range(NEAR_BANDS):
        base = base.withColumn(
            f"nb_{b}",
            _bucket_expr(
                "vec", dim, range(b * PLANES_PER_BAND, (b + 1) * PLANES_PER_BAND)
            ),
        )
    bands = [
        base.select(
            "vec_id", "vec", "norm", F.lit(b).alias("band"), F.col(f"nb_{b}").alias("key")
        )
        for b in range(NEAR_BANDS)
    ]
    buckets = bands[0]
    for extra in bands[1:]:
        buckets = buckets.unionByName(extra)
    a, b = buckets.alias("a"), buckets.alias("b")
    cos = _dot("a.vec", "b.vec") / (F.col("a.norm") * F.col("b.norm"))
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
    )
    # a pair colliding in both bands appears twice with an identical
    # cosine; max() collapses it without a second pass over the vectors
    return (
        pairs.groupBy("vec_a", "vec_b")
        .agg(F.max("cosine").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    emb: DataFrame,
    n_cells: int = N_CELLS,
    threshold: float = 0.35,
    index=None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with a coarse quantizer, then
    drop any vector that has a lower-id near-duplicate (cosine >=
    ``threshold``) in the SAME cell. Returns one row per vector:
    (vec_id, cell_id, dup_of, kept) where ``dup_of`` is the lowest-id
    in-cell near-duplicate (NULL when kept).

    Scale shape: the centroid table is broadcast (never shuffled), cell
    assignment is one scan + per-row argmax, and the only self-join is
    cell-blocked — pair count is bounded by the largest cell, never
    all-pairs. The keep policy ("lower id wins") is a deterministic,
    order-free restatement of SemDeDup's keep-one-per-duplicate-group
    that both engines compute identically without iteration.

    Centroids are the first ``n_cells`` vectors by vec_id — the same
    deterministic stand-in for offline k-means as ``ivf_topk`` (the
    dataflow, which is what matters at scale, is identical either way).

    ``index``: optional :class:`~audit_star_spark.analytics.ivf_index.
    IVFIndex` — the train-once / probe-many path. The persisted cell
    assignments replace both the centroid broadcast and the assignment
    scan entirely (``emb`` and ``n_cells`` are then ignored for
    assignment; the cell-blocked dedup join runs straight off the
    partitioned assignment parquet).
    """
    if index is not None:
        assigned = index.assignments(emb.sparkSession).select(
            "vec_id", "vec", "norm", "cell_id"
        )
    else:
        base = _prepared(emb)
        cents = base.filter(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell_id"),
            F.col("vec").alias("cvec"),
            F.col("norm").alias("cnorm"),
        )
        # in-row argmax assignment — no corpus exchange (see ivf_topk)
        assigned = _assign_to_cells(
            base.select("vec_id", "vec", "norm"), cents
        )
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = _dot("a.vec", "b.vec") / (F.col("a.norm") * F.col("b.norm"))
    dup_of = (
        a.join(
            b,
            (F.col("a.cell_id") == F.col("b.cell_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= threshold)
        .groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(F.min(F.col("a.vec_id")).alias("dup_of"))
    )
    return (
        assigned.drop("vec", "norm")
        .join(dup_of, "vec_id", "left")
        .select(
            "vec_id",
            "cell_id",
            "dup_of",
            F.col("dup_of").isNull().alias("kept"),
        )
    )


def _packed_cells(cents: DataFrame, fields: str) -> DataFrame:
    """ONE-row frame ``__cells``: the centroid table collapsed to a
    cell_id-ASCENDING array of structs — the broadcastable form of the
    whole (bounded) centroid set, so assignment can run as an in-row
    fold instead of an explode join + per-vector window."""
    return cents.agg(
        F.expr(f"array_sort(collect_list(struct({fields})))").alias("__cells")
    )


# in-row argmax over the packed centroid array: score every cell once
# (transform), then fold keeping the STRICTLY greater cosine — ties keep
# the running best, and the array is cell_id-ascending, so equal cosines
# resolve to the smaller cell_id: the (ccos DESC, cell_id) row_number
# semantics this replaces, for every finite cosine. The dot/divide
# arithmetic is the _dot expression verbatim, so scores are
# bit-identical. Known divergence: a ZERO-NORM vector scores NaN against
# every cell; NaN > -Infinity is false, so the fold yields cell_id = -1
# with sim -Infinity, where the window (NaN sorts first DESC in Spark)
# picked a real cell with NaN score — consistent with the repo's
# NaN-drop convention in _topk_per_query, and unreachable for the
# declared queries (synthetic vectors are never all-zero).
_BEST_CELL_S = (
    "aggregate("
    "transform(__cells, c -> named_struct("
    "'s', aggregate(zip_with(c.cvec, {vec}, (x, y) -> x * y), "
    "CAST(0.0 AS DOUBLE), (s, v) -> s + v) / (c.cnorm * {norm}), "
    "'c', c.cell_id)), "
    "named_struct('s', CAST('-Infinity' AS DOUBLE), 'c', CAST(-1 AS BIGINT)), "
    "(acc, x) -> CASE WHEN x.s > acc.s THEN x ELSE acc END)"
)
_BEST_CELL = _BEST_CELL_S + ".c"


def _assign_to_cells(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment as ONE in-row argmax per vector over
    the broadcast cell_id-sorted centroid array — no explode join, no
    per-vector window, NO exchange: the corpus keeps its input
    partitioning and the only shuffled bytes are the bounded centroid
    pack. (The previous shape broadcast-joined every vector against all
    n_cells centroids and ran row_number over a per-vec_id window —
    n_cells x the corpus bytes through an exchange + sort just to pick
    each vector's argmax.) EVERY column of ``base`` passes through with
    ``cell_id`` appended, so callers that need payload columns (label,
    side) alongside the assignment carry them in-row instead of
    re-joining the corpus on vec_id afterwards — the join was a second
    full exchange of the big side. cents = (cell_id, cvec, cnorm)."""
    packed = _packed_cells(cents, "cell_id, cvec, cnorm")
    return base.crossJoin(F.broadcast(packed)).select(
        *base.columns,
        F.expr(_BEST_CELL.format(vec="vec", norm="norm")).alias("cell_id"),
    )


def _cell_means(assigned: DataFrame, bit_exact: bool = True) -> DataFrame:
    """Element-wise per-cell mean: posexplode -> (cell, dim) aggregate
    -> reassembled array. The group is cell occupancy (~corpus/k), so
    ``bit_exact`` picks the gate's sorted fold (oracle bit-parity) or
    production plain SUM (map-side combinable, O(1) buffers —
    functions/folds.py)."""
    sums = (
        assigned.select("cell_id", F.posexplode("vec").alias("pos", "x"))
        .groupBy("cell_id", "pos")
        .agg(
            F.expr(fold_sum("x", bit_exact)).alias("s"),
            F.count("*").alias("n"),
        )
    )
    means = sums.select("cell_id", "pos", (F.col("s") / F.col("n")).alias("m"), "n")
    return means.groupBy("cell_id").agg(
        F.max("n").cast("long").alias("n_members"),
        F.expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)").alias(
            "centroid"
        ),
    )


def kmeans_train(
    emb: DataFrame,
    n_cells: int = N_CELLS,
    iters: int = 3,
    bit_exact: bool = True,
) -> tuple[DataFrame, list[float]]:
    """Full k-means: iterate the Lloyd step (assign -> mean) from the
    deterministic first-``n_cells`` seed. Returns (centroids, shifts)
    where centroids = (cell_id, n_members, centroid) after the last round
    and shifts[r] = max L2 movement of any centroid in round r — the
    convergence signal.

    Scale shape per round: one assignment job (broadcast centroids, no
    shuffle of the corpus) + the tiny (cell, dim)-keyed mean aggregate.
    The new centroid table is collected driver-side to build the next
    round's broadcast — n_cells x dims scalars, a bounded control
    decision exactly like bpe_train's top-pair probe, never corpus data.
    """
    spark = emb.sparkSession
    base = _prepared(emb)
    base.persist()
    cents_rows = [
        (int(r["vec_id"]), list(r["vec"]))
        for r in base.filter(F.col("vec_id") < n_cells)
        .select("vec_id", "vec")
        .collect()
    ]
    if iters < 1:
        raise ValueError("iters must be >= 1")
    shifts: list[float] = []
    for _ in range(iters):
        cents = spark.createDataFrame(
            cents_rows, "cell_id long, cvec array<double>"
        ).withColumn(
            "cnorm",
            F.sqrt(
                F.expr(
                    "aggregate(zip_with(cvec, cvec, (x, y) -> x * y), "
                    "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
                )
            ),
        )
        new_rows = [
            (int(r["cell_id"]), list(r["centroid"]), int(r["n_members"]))
            for r in _cell_means(
                _assign_to_cells(base, cents), bit_exact=bit_exact
            ).collect()
        ]
        prev = dict(cents_rows)
        shift = 0.0
        for cell_id, centroid, _n in new_rows:
            old = prev.get(cell_id)
            if old is not None:
                shift = max(
                    shift,
                    sum((a - b) ** 2 for a, b in zip(old, centroid)) ** 0.5,
                )
        shifts.append(shift)
        cents_rows = [(c, v) for c, v, _n in new_rows]
    base.unpersist()
    # the final centroids were already collected for the shift probe —
    # rebuild the result from them rather than returning a lazy plan whose
    # persisted input was just released (re-execution would recompute the
    # whole assignment from scratch)
    out = spark.createDataFrame(
        [(c, n, v) for c, v, n in new_rows],
        "cell_id long, n_members long, centroid array<double>",
    )
    return out, shifts


def kmeans_update(
    emb: DataFrame, n_cells: int = N_CELLS, bit_exact: bool = True
) -> DataFrame:
    """One distributed Lloyd iteration over the coarse-quantizer
    centroids: assign every vector to its nearest centroid (broadcast
    cosine argmax — the same assignment the IVF/SemDeDup operators use),
    then recompute each cell's centroid as the element-wise mean of its
    members. Returns (cell_id, n_members, centroid array<double>); empty
    cells vanish. Iterating this to convergence IS k-means — one round is
    the oracle-checkable unit.

    Scale shape: centroids broadcast; the mean is posexplode ->
    (cell, dim) hash aggregate with map-side combine -> per-cell
    reassembly. Shuffle volume is n_cells x dims x 2 rows, independent of
    corpus size. The per-(cell, dim) sum honors ``bit_exact``
    (functions/folds.py): the gate default folds the SORTED value list
    (float addition is order-sensitive; sorted sequential folds are
    not), production uses plain SUM since the group is cell occupancy.
    """
    base = _prepared(emb)
    cents = base.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    return _cell_means(_assign_to_cells(base, cents), bit_exact=bit_exact)


def label_nearest_neighbor(emb: DataFrame, salt_buckets: int = 1) -> DataFrame:
    """For every vector: its nearest neighbor within the same label
    (label-blocked near-dup scan; blocks bound the pair count).

    Hot-label guard: a label with L rows contributes L² pairs, and an
    unsalted join puts them all in ONE task — with a skewed label
    distribution a single straggler dominates the stage. Two defenses:

    - default: AQE skew-join (spark.sql.adaptive.skewJoin.enabled, on in
      session.py) splits oversized join partitions at runtime and costs
      NOTHING when labels are balanced;
    - ``salt_buckets > 1``: deterministic worst-case guard — side A is
      hashed into buckets, side B replicated into every bucket, join key
      (label, salt); each (a, b) pair still meets exactly once, the
      hottest label spreads over ``salt_buckets`` tasks.

    Salting is OPT-IN because it taxes the balanced case: measured at
    sf0.1 (balanced labels, local[32]) 1.7s unsalted vs 5.3s with
    salt_buckets=8 — the B-side shuffle is replicated ×buckets whether or
    not any label is hot (ARCHITECTURE.md "label-NN skew guard"). Use it
    when one label dominates AND AQE's split granularity (partition-level)
    is too coarse. Equality across both paths is test-locked.

    At ``salt_buckets <= 1`` the salt columns are skipped entirely: the
    r02 bench showed the "no-op" ``explode(sequence(0, 0))`` costs 3×
    (0.81s → 2.46s at sf0.1) — the Generate node breaks whole-stage
    codegen across the B-side scan and forces an extra projection pass.

    The argmax is ``max_by`` over a (cosine, -nn_vec_id) struct rather
    than a row_number window: partial aggregation combines map-side, so
    the post-join exchange carries ONE row per vec_id instead of every
    same-label pair — at 100 TB the pair stream never shuffles."""
    base = _prepared(emb)
    if salt_buckets <= 1:
        a, b = base.alias("a"), base.alias("b")
        cond = (F.col("a.label") == F.col("b.label")) & (
            F.col("a.vec_id") != F.col("b.vec_id")
        )
    else:
        a = base.withColumn(
            "salt", F.pmod(F.hash("vec_id"), F.lit(salt_buckets))
        ).alias("a")
        b = base.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        ).alias("b")
        cond = (
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.vec_id") != F.col("b.vec_id"))
        )
    cos = _dot("a.vec", "b.vec") / (F.col("a.norm") * F.col("b.norm"))
    pairs = a.join(b, cond).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("a.label").alias("label"),
        F.col("b.vec_id").alias("nn_vec_id"),
        cos.alias("cosine"),
    )
    best = F.max(F.struct(F.col("cosine"), (-F.col("nn_vec_id")).alias("neg_nn")))
    return (
        pairs.groupBy("vec_id", "label")
        .agg(best.alias("best"))
        .select(
            "vec_id",
            "label",
            (-F.col("best.neg_nn")).alias("nn_vec_id"),
            F.col("best.cosine").alias("nn_cosine"),
        )
    )


# ----------------------------------------------- int8 quantization (r3)
# Symmetric per-vector int8: scale = max|x| / 127, q_i = round(x_i/scale).
# At 100 TB this is THE storage/bandwidth lever for the vector column: 4x
# smaller than float32 (16x smaller than the double staging), integer dot
# products, and the per-vector scale cancels out of cosine entirely.
Q_MAX = 127


def _quantized_staged(emb: DataFrame) -> DataFrame:
    """vec_id, label, vec (double), scale, qvec — shared staged chain
    (intermediates staged as columns per the re-inlining rule)."""
    staged = (
        emb.select("vec_id", "label", F.expr(VEC_EXPR).alias("vec"))
        .withColumn(
            "scale",
            F.expr(
                "aggregate(vec, CAST(0.0 AS DOUBLE), (s, v) -> greatest(s, abs(v)))"
            )
            / F.lit(float(Q_MAX)),
        )
    )
    qvec = F.expr(
        f"CASE WHEN scale = 0.0 THEN transform(vec, x -> CAST(0 AS TINYINT)) "
        f"ELSE transform(vec, x -> CAST(greatest(CAST(-{Q_MAX} AS DOUBLE), "
        f"least(CAST({Q_MAX} AS DOUBLE), floor(x / scale + 0.5))) AS TINYINT)) END"
    )
    return staged.select("vec_id", "label", "vec", "scale", qvec.alias("qvec"))


def quantize_embeddings(emb: DataFrame) -> DataFrame:
    """(vec_id, label, scale, qvec array<tinyint>) — deterministic
    round-half-up via floor(x/scale + 0.5) (identical in any engine; no
    banker's-rounding ambiguity). Zero vectors quantize to all zeros with
    scale 0. Pure in-row expression algebra, zero shuffles."""
    return _quantized_staged(emb).select("vec_id", "label", "scale", "qvec")


def quantization_report(emb: DataFrame) -> DataFrame:
    """Per-vector quantization fidelity: (vec_id, scale, mse, cos_sim)
    where mse is the mean squared reconstruction error of q*scale against
    the original and cos_sim the cosine between original and dequantized
    vector (scale cancels, so it is computed against the raw int8 vector —
    integer-exact products, floats only in the final ratio). Zero-shuffle:
    the original vector rides the staged chain instead of a re-join."""
    q = _quantized_staged(emb)
    mse = F.expr(
        "aggregate(zip_with(vec, qvec, (x, qi) -> (x - qi * scale) * (x - qi * scale)), "
        "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    ) / F.size("vec").cast("double")
    dot_vq = F.expr(
        "aggregate(zip_with(vec, qvec, (x, qi) -> x * CAST(qi AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    )
    dot_vv = F.expr(
        "aggregate(zip_with(vec, vec, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    )
    dot_qq = F.expr(
        "aggregate(zip_with(qvec, qvec, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), "
        "CAST(0 AS BIGINT), (s, v) -> s + v)"
    )
    den = F.sqrt(dot_vv) * F.sqrt(dot_qq.cast("double"))
    return q.select(
        "vec_id",
        "scale",
        mse.alias("mse"),
        (dot_vq / F.nullif(den, F.lit(0.0))).alias("cos_sim"),
    )


def quantized_topk(emb: DataFrame, n_queries: int = 8, k: int = 10) -> DataFrame:
    """Brute-force top-k cosine on the int8-quantized vectors: integer
    dot products (exact BIGINT folds — no float summation-order issues),
    per-vector scales cancel out of cosine, floats only in the final
    ratio. Same broadcast-query shape as cosine_topk."""
    from audit_star_spark.util import spread

    base = spread(quantize_embeddings(emb)).withColumn(
        "qnorm",
        F.sqrt(
            F.expr(
                "aggregate(zip_with(qvec, qvec, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), "
                "CAST(0 AS BIGINT), (s, v) -> s + v)"
            ).cast("double")
        ),
    )
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm").alias("q_qnorm"),
    )
    joined = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    dot_q = F.expr(
        "aggregate(zip_with(q_qvec, qvec, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), "
        "CAST(0 AS BIGINT), (s, v) -> s + v)"
    )
    cos = dot_q.cast("double") / F.nullif(
        F.col("q_qnorm") * F.col("qnorm"), F.lit(0.0)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        joined.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def quantized_recall(emb: DataFrame, n_queries: int = 8, k: int = 10) -> DataFrame:
    """Recall@k of the int8 path against the exact float top-k:
    (query_id, n_hits, recall) — the accuracy number that justifies (or
    rejects) shipping quantized vectors at scale."""
    exact = cosine_topk(emb, n_queries=n_queries, k=k).select("query_id", "vec_id")
    quant = quantized_topk(emb, n_queries=n_queries, k=k).select(
        "query_id", F.col("vec_id").alias("q_vec_id")
    )
    hits = exact.join(
        quant,
        (exact["query_id"] == quant["query_id"])
        & (exact["vec_id"] == quant["q_vec_id"]),
        "left",
    ).groupBy(exact["query_id"].alias("query_id"))
    return hits.agg(
        F.count(F.col("q_vec_id")).cast("long").alias("n_hits")
    ).select(
        "query_id",
        "n_hits",
        (F.col("n_hits").cast("double") / float(k)).alias("recall"),
    )


# ----------------------------------------------------- random projection
# Johnson-Lindenstrauss sign projection: out_dim=16 makes every matrix
# entry +-1/sqrt(16) = +-0.25 — exactly representable in binary floating
# point, so Spark and the SQL oracle compute BIT-IDENTICAL projections
# when both fold the dot product left-to-right over the same literals.
PROJ_OUT_DIM = 16
PROJ_SEED = 7


def projection_matrix(
    in_dim: int, out_dim: int = PROJ_OUT_DIM, seed: int = PROJ_SEED
) -> list[list[float]]:
    """Deterministic +-1/sqrt(out_dim) sign matrix (Achlioptas 2003's
    database-friendly JL variant), generated from a seeded PCG stream so
    the engine and the oracle share the exact literals."""
    import numpy as np

    rng = np.random.default_rng(seed)
    signs = rng.integers(0, 2, size=(out_dim, in_dim)) * 2 - 1
    return (signs / np.sqrt(out_dim)).tolist()


def project_embeddings(
    emb: DataFrame,
    in_dim: int = 64,
    out_dim: int = PROJ_OUT_DIM,
    seed: int = PROJ_SEED,
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, label, proj array<double>) — each vector mapped to
    ``out_dim`` dimensions by the seeded sign matrix. Pure in-row
    expression algebra (out_dim fixed-order fold dot products), zero
    shuffles, whole-stage codegen; the 4x-16x storage cut is the scale
    lever for downstream ANN sweeps (JL: pairwise distances preserved
    within 1 +- eps w.h.p. for out_dim = O(ln n / eps^2))."""
    m = projection_matrix(in_dim, out_dim, seed)
    dots = [
        F.expr(
            "aggregate(zip_with({v}, array({row}), (a, b) -> CAST(a AS DOUBLE) * b), "
            "0D, (acc, x) -> acc + x)".format(
                v=vec_col, row=", ".join(repr(x) + "D" for x in row)
            )
        )
        for row in m
    ]
    return emb.select("vec_id", "label", F.array(*dots).alias("proj"))


def projection_distortion(
    emb: DataFrame,
    in_dim: int = 64,
    out_dim: int = PROJ_OUT_DIM,
    seed: int = PROJ_SEED,
    pair_mod: int = 25,
) -> DataFrame:
    """Distance-preservation report on a deterministic pair sample:
    every vec_id divisible by ``pair_mod`` pairs with vec_id+1, and the
    row carries the original and projected Euclidean distances plus
    their ratio (the JL distortion). One broadcastable self-join on the
    tiny sampled slice — the full corpus is never paired."""
    proj = project_embeddings(emb, in_dim, out_dim, seed)
    both = emb.select("vec_id", "embedding").join(proj.select("vec_id", "proj"), "vec_id")
    a = both.filter((F.col("vec_id") % pair_mod) == 0).alias("a")
    b = both.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("b.vec_id") == F.col("a.vec_id") + 1
    )

    def _l2(col_a: str, col_b: str) -> F.Column:
        return F.sqrt(
            F.expr(
                f"aggregate(zip_with({col_a}, {col_b}, "
                "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
                "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, (acc, v) -> acc + v)"
            )
        )

    return pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        _l2("a.embedding", "b.embedding").alias("orig_dist"),
        _l2("a.proj", "b.proj").alias("proj_dist"),
        (_l2("a.proj", "b.proj") / _l2("a.embedding", "b.embedding")).alias(
            "distortion"
        ),
    )


def embedding_outliers(
    emb: DataFrame, in_dim: int = 64, z_threshold: float = 3.0
) -> DataFrame:
    """Corrupt-vector sweep: distance of every embedding to the corpus
    centroid, z-scored over the distance distribution — the cheap first
    filter for truncated/zeroed/garbage vectors before any ANN work.

    Returns (vec_id, label, dist, z, is_outlier). The centroid is
    ``in_dim`` per-dimension SUM aggregates — partial-aggregated
    map-side, one 1-row result, never a collect_list funnel of the
    corpus into a single reducer — broadcast back; the distance
    mean/std is a second 1-row broadcast. Everything else is in-row
    algebra: two corpus scans, zero keyed shuffles, no Python."""
    dim_sums = emb.agg(
        *[
            F.sum(F.expr(f"CAST(embedding[{i}] AS DOUBLE)")).alias(f"s{i}")
            for i in range(in_dim)
        ],
        F.count("*").alias("n"),
    ).select(
        F.array(
            *[F.col(f"s{i}") / F.col("n") for i in range(in_dim)]
        ).alias("centroid")
    )
    with_dist = emb.crossJoin(F.broadcast(dim_sums)).select(
        "vec_id",
        "label",
        F.sqrt(
            F.expr(
                "aggregate(zip_with(embedding, centroid, "
                "(x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), "
                "0D, (acc, v) -> acc + v)"
            )
        ).alias("dist"),
    )
    stats = with_dist.agg(
        F.avg("dist").alias("mu"), F.stddev_pop("dist").alias("sigma")
    )
    return with_dist.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        "label",
        "dist",
        ((F.col("dist") - F.col("mu")) / F.col("sigma")).alias("z"),
        (
            F.abs((F.col("dist") - F.col("mu")) / F.col("sigma"))
            > F.lit(z_threshold)
        ).alias("is_outlier"),
    )


def projected_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    in_dim: int = 64,
    out_dim: int = PROJ_OUT_DIM,
    seed: int = PROJ_SEED,
) -> DataFrame:
    """Brute-force cosine top-k in the JL-PROJECTED space — the narrow
    (out_dim/in_dim of the bytes) sweep that stands in for the full-dim
    scan at scale. Same broadcast-query shape as :func:`cosine_topk`."""
    proj = project_embeddings(emb, in_dim, out_dim, seed)
    norm = F.sqrt(
        F.expr("aggregate(proj, 0D, (acc, x) -> acc + x * x)")
    )
    base = proj.select("vec_id", "proj", norm.alias("norm"))
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("proj").alias("qproj"),
        F.col("norm").alias("qnorm"),
    )
    joined = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    dot = F.expr(
        "aggregate(zip_with(qproj, proj, (a, b) -> a * b), 0D, (acc, v) -> acc + v)"
    )
    cos = dot / F.nullif(F.col("qnorm") * F.col("norm"), F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        joined.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def projected_recall(
    emb: DataFrame, n_queries: int = 8, k: int = 10, **proj_kw
) -> DataFrame:
    """Recall@k of the JL-projected sweep against the exact full-dim
    top-k — the accuracy gate that justifies (or rejects) running ANN
    over 16-d projections; twin of :func:`quantized_recall`.

    Interpretation caveat the gate exists to surface: on near-uniform
    random vectors (this repo's synthetic corpus) neighbors are nearly
    equidistant, so 16-d recall@10 sits far below 1.0 (~0.1-0.3 — still
    ~10x the k/N chance level). On real clustered embeddings the same
    projection scores far higher; run THIS gate on YOUR corpus before
    shipping the 4x-narrower sweep — that is the operator's point."""
    exact = cosine_topk(emb, n_queries=n_queries, k=k).select(
        "query_id", "vec_id"
    )
    proj = projected_topk(emb, n_queries=n_queries, k=k, **proj_kw).select(
        "query_id", F.col("vec_id").alias("p_vec_id")
    )
    hits = exact.join(
        proj,
        (exact["query_id"] == proj["query_id"])
        & (exact["vec_id"] == proj["p_vec_id"]),
        "left",
    ).groupBy(exact["query_id"].alias("query_id"))
    return hits.agg(
        F.count(F.col("p_vec_id")).cast("long").alias("n_hits")
    ).select(
        "query_id",
        "n_hits",
        (F.col("n_hits").cast("double") / float(k)).alias("recall"),
    )


def _fused_prefix_topk(
    base: DataFrame, dims: tuple[int, ...], n_queries: int, k: int
) -> DataFrame:
    """Exact cosine top-k for EVERY prefix length in ``dims`` (plus the
    full dimension, tagged ``prefix_dim = 0``) off ONE corpus scan: per
    candidate pair, each prefix cosine is one in-row slice/dot, the
    (prefix_dim, cosine) entries explode map-side, and the per-
    (prefix, query) top-k is the two-phase partial fold — no
    query-partitioned row_number window funneling each query's full
    candidate stream through one task, and no per-prefix re-scan of the
    corpus. The slice/dot/sqrt arithmetic is the per-prefix-scan
    expression verbatim (slice of the SAME prepared vec), so rankings
    are bit-identical to the unfused form. Returns (prefix_dim,
    query_id, vec_id)."""
    pre = base.select(
        "vec_id",
        "vec",
        "norm",
        *[
            F.sqrt(
                _dot(f"slice(vec, 1, {d})", f"slice(vec, 1, {d})")
            ).alias(f"pn_{d}")
            for d in dims
        ],
    )
    q = pre.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        *[F.col(f"pn_{d}").alias(f"qn_{d}") for d in dims],
    )
    joined = pre.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    entries = [
        F.struct(
            F.lit(0).alias("prefix_dim"),
            (_dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))).alias(
                "cosine"
            ),
        )
    ]
    for d in dims:
        cos_d = _dot(f"slice(qvec, 1, {d})", f"slice(vec, 1, {d})") / (
            F.col(f"qn_{d}") * F.col(f"pn_{d}")
        )
        entries.append(
            F.struct(F.lit(d).alias("prefix_dim"), cos_d.alias("cosine"))
        )
    pairs = joined.select(
        "query_id", "vec_id", F.explode(F.array(*entries)).alias("pc")
    ).select("query_id", "vec_id", "pc.prefix_dim", "pc.cosine")
    return _topk_per_query(
        pairs, k, [], keys=["prefix_dim", "query_id"]
    ).select("prefix_dim", "query_id", "vec_id")


def matryoshka_recall(
    emb: DataFrame,
    dims: tuple[int, ...] = (16, 32, 64),
    n_queries: int = 8,
    k: int = 10,
) -> DataFrame:
    """Matryoshka truncation quality report (Kusupati et al. 2022,
    "Matryoshka Representation Learning"): recall@k of exact cosine
    search over each PREFIX of the embedding against the full-dim
    exact top-k — the measurement that justifies (or rejects) storing/
    searching truncated vectors, the standard MRL deployment question.
    Returns (prefix_dim, query_id, n_hits, recall), one row per
    (prefix, query).

    Scale shape: ONE broadcast-query corpus scan computes every prefix
    cosine in-row and the full-dim reference ranking together
    (:func:`_fused_prefix_topk` — two-phase partial top-k per
    (prefix, query), no rank window, no per-prefix re-scan); the
    bounded (|dims|+1) * n_queries * k ranking materializes once and
    the recall join touches only those rows. The interpretation caveat
    of projected_recall applies verbatim on near-uniform synthetic
    vectors."""
    if not dims:
        raise ValueError("dims must be non-empty")
    dim = _vec_dim(emb)
    if any(d < 1 or d > dim for d in dims):
        raise ValueError(f"dims must be within [1, {dim}], got {dims}")
    # dedupe (order-preserving): the fused scan emits one candidate
    # stream per listed prefix, so a duplicated dim would double its
    # candidates and corrupt that prefix's top-k
    dims = tuple(dict.fromkeys(dims))
    from audit_star_spark.plans.iterate import iter_materialize

    base = _prepared(emb)
    # bounded frame; materialize so the exact and prefix consumers read
    # the same computed ranking instead of re-running the corpus scan
    fused = iter_materialize(
        _fused_prefix_topk(base, tuple(dims), n_queries, k), eager=False
    )
    exact = fused.filter(F.col("prefix_dim") == 0).select(
        "query_id", "vec_id"
    )
    pre = fused.filter(F.col("prefix_dim") != 0).select(
        F.col("prefix_dim").alias("p_dim"),
        F.col("query_id").alias("p_query_id"),
        F.col("vec_id").alias("p_vec_id"),
    )
    expected = exact.select(
        F.explode(F.array(*[F.lit(d) for d in dims])).alias("prefix_dim"),
        "query_id",
        "vec_id",
    )
    return (
        expected.join(
            pre,
            (expected["prefix_dim"] == pre["p_dim"])
            & (expected["query_id"] == pre["p_query_id"])
            & (expected["vec_id"] == pre["p_vec_id"]),
            "left",
        )
        .groupBy("prefix_dim", "query_id")
        .agg(F.count(F.col("p_vec_id")).cast("long").alias("n_hits"))
        .select(
            "prefix_dim",
            "query_id",
            "n_hits",
            (F.col("n_hits").cast("double") / float(k)).alias("recall"),
        )
    )


def cluster_balanced_sample(
    emb: DataFrame,
    n_cells: int = N_CELLS,
    per_cell: int = 4,
    salt: str = "cbs",
) -> DataFrame:
    """Cluster-balanced (diversity) sampling: assign every vector to
    its nearest coarse centroid (the kmeans_update / IVF assignment —
    broadcast cosine argmax over the deterministic first-``n_cells``
    seed) and keep ``per_cell`` deterministic samples per cell — the
    standard embedding-space stratification that stops a dominant mode
    from monopolizing a subsample (cluster-then-sample, as in SemDeDup
    -adjacent curation pipelines). Returns (cell_id, vec_id, label).

    Scale shape: one broadcast-assignment scan, one cell-keyed rank
    window (per-group top-k, no global sort); the sample key is the
    md5-uniform family of weighted_sample, so reruns and engines
    agree."""
    if per_cell < 1:
        raise ValueError(f"per_cell must be >= 1, got {per_cell}")
    base = _prepared(emb)
    cents = base.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    # label rides through the assignment (column passthrough) — no
    # corpus-side re-join on vec_id
    assigned = _assign_to_cells(base, cents)
    u = F.expr(
        f"(CAST(conv(substring(md5(CAST(vec_id AS STRING) || ':{salt}'), "
        "1, 15), 16, 10) AS BIGINT))"
    )
    w = Window.partitionBy("cell_id").orderBy(
        F.col("__u").asc(), F.col("vec_id")
    )
    return (
        assigned.withColumn("__u", u)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_cell)
        .select("cell_id", "vec_id", "label")
    )


def kmeans_lightweight_coreset(
    emb: DataFrame,
    m: int = 64,
    salt: str = "lwcs",
    bit_exact: bool = True,
) -> DataFrame:
    """Lightweight coreset for k-means (Bachem, Lucic & Krause 2018,
    "Scalable k-Means Clustering via Lightweight Coresets"): sample
    ``m`` points with probability

        q(x) = 1/2 * 1/N + 1/2 * d(x, mean)^2 / sum_x' d(x', mean)^2

    and weight each pick 1/(m * q(x)); k-means cost on the weighted
    sample approximates cost on the full corpus within the paper's
    bounds. This is THE primitive that turns 100 TB of embeddings into
    a driver-sized weighted set the exact solver (kmeans_train) can
    iterate on. Returns (vec_id, label, q, weight).

    Sampling is the deterministic Efraimidis-Spirakis draw of
    weighted_sample (md5 uniforms, key u^(1/q), top-m WITHOUT
    replacement via TakeOrderedAndProject) — the engine-portable form
    of the paper's multinomial draw; the weight formula is unchanged.
    Two corpus passes (mean, then distances) plus the top-m; the
    corpus-sized folds honor ``bit_exact`` (functions/folds.py)."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    from audit_star_spark.functions.folds import fold_sum

    base = _prepared(emb)
    n = base.count()  # bounded: one scalar
    if n == 0:
        raise ValueError("empty embedding corpus")
    if m > n:
        raise ValueError(f"m {m} exceeds corpus size {n}")
    mean = (
        base.select(F.posexplode("vec").alias("i", "x"))
        .groupBy("i")
        .agg((F.expr(fold_sum("x", bit_exact)) / F.lit(float(n))).alias("m"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, m))), x -> x.m)"
            ).alias("ml")
        )
    )
    with_d2 = base.crossJoin(F.broadcast(mean)).select(
        "vec_id",
        "label",
        F.expr(
            "aggregate(zip_with(vec, ml, (x, mu) -> (x - mu) * (x - mu)), "
            "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
        ).alias("d2"),
    )
    tot = with_d2.agg(F.expr(fold_sum("d2", bit_exact)).alias("s"))
    scored = with_d2.crossJoin(F.broadcast(tot)).select(
        "vec_id",
        "label",
        (
            F.lit(0.5 / n) + F.lit(0.5) * F.col("d2") / F.col("s")
        ).alias("q"),
    )
    u = F.expr(
        f"(CAST(conv(substring(md5(CAST(vec_id AS STRING) || ':{salt}'), "
        "1, 15), 16, 10) AS DOUBLE) + 1.0) / 1152921504606846977.0"
    )
    return (
        scored.withColumn("__key", F.pow(u, F.lit(1.0) / F.col("q")))
        .orderBy(F.col("__key").desc(), F.col("vec_id"))
        .limit(m)
        .select(
            "vec_id",
            "label",
            "q",
            (F.lit(1.0) / (F.lit(float(m)) * F.col("q"))).alias("weight"),
        )
    )


def incontext_order(
    emb: DataFrame, n_cells: int = N_CELLS, mode: str = "distributed"
) -> DataFrame:
    """In-Context Pretraining batch ordering (Shi et al. 2024,
    "In-Context Pretraining: Language Modeling Beyond Document
    Boundaries", arXiv:2310.10638): order the corpus so semantically
    related documents are ADJACENT in the training stream — the paper
    shows the context a document is packed next to matters, and its
    scale recipe approximates the greedy max-similarity path with a
    cluster traversal. This operator is that scale form: nearest coarse
    cell first (broadcast argmax over the deterministic first-n_cells
    centroids — the ivf/semantic_dedup convention), most-central
    documents first within each cell. Returns (vec_id, cell_id, sim6,
    position) with ``position`` gapless over the whole corpus — the
    shard writer consumes it directly.

    Ordering determinism: position sorts on the 6-dp ROUNDED centroid
    similarity (descending) then vec_id — raw-float ordering differs in
    the last ulp across engines, and a flip would renumber every later
    position (the float-portability rule applied to ORDERING). Scale
    shape: one broadcast-argmax scan (per-vector group = n_cells,
    bounded) plus the gapless-id two-pass — no corpus-sized window
    partition in 'distributed' mode.

    EAGER: calling this function runs two bounded Spark jobs at
    DataFrame-CONSTRUCTION time (an id-density probe — count/min/max —
    and, only for sparse/offset ids, a TakeOrdered of the n_cells
    smallest ids), so the returned plan cannot dangle on a
    `vec_id < n_cells` predicate that matches nothing. Callers that
    need fully lazy composition should pre-validate ids and call the
    dense path themselves. On sparse ids the centroid set is the
    n_cells SMALLEST ids (not `vec_id < n_cells`, which would select
    nothing) — for dense 0..n-1 ids both rules pick the same vectors
    and the plan is byte-identical to the direct filter."""
    if n_cells < 1:
        raise ValueError(f"n_cells must be >= 1, got {n_cells}")
    from audit_star_spark.operators.ids import gapless_ids

    base = _prepared(emb)
    # Centroids are "the first n_cells vectors" (the ivf/semantic_dedup
    # convention) — but `vec_id < n_cells` is only right for dense
    # 0..n-1 ids. Sparse or offset ids would select nothing and the
    # whole-corpus ordering would silently come back empty (the same
    # failure class knn_graph probes for). Probe density with one
    # bounded aggregate; when ids are NOT dense, take the n_cells
    # SMALLEST ids instead (TakeOrdered — bounded, no full sort; for
    # dense inputs the probe passes and the plan is byte-identical to
    # the direct filter).
    prof = base.agg(
        F.count("*").alias("n"),
        F.min("vec_id").alias("lo"),
        F.max("vec_id").alias("hi"),
    ).collect()[0]
    if prof["n"] == 0:
        raise ValueError("incontext_order: empty corpus")
    if prof["lo"] == 0 and prof["hi"] == prof["n"] - 1:
        cent_pred = F.col("vec_id") < n_cells
    else:
        first_ids = [
            r["vec_id"]
            for r in base.select("vec_id")
            .orderBy("vec_id")
            .limit(n_cells)
            .collect()
        ]  # bounded: at most n_cells ids
        cent_pred = F.col("vec_id").isin(first_ids)
    cents = base.filter(cent_pred).select(
        F.col("vec_id").alias("cell_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    # in-row argmax assignment carrying the winning score — no corpus
    # exchange (see ivf_topk); _BEST_CELL_S is the same fold with the
    # struct kept so sim6 comes out of the one pass
    packed = _packed_cells(cents, "cell_id, cvec, cnorm")
    best = F.expr(_BEST_CELL_S.format(vec="vec", norm="norm"))
    assigned = (
        base.crossJoin(F.broadcast(packed))
        .select("vec_id", best.alias("__b"))
        .select(
            "vec_id",
            F.col("__b.c").alias("cell_id"),
            F.round(F.col("__b.s"), 6).alias("sim6"),
        )
        .withColumn("__negsim", -F.col("sim6"))
    )
    return gapless_ids(
        assigned,
        order_by=["cell_id", "__negsim", "vec_id"],
        id_col="position",
        mode=mode,
    ).select("vec_id", "cell_id", "sim6", F.col("position").cast("long").alias("position"))


def clip_alignment_census(
    pairs: DataFrame,
    img_col: str = "img_vec",
    txt_col: str = "txt_vec",
    threshold: float = 0.28,
    label_col: str = "label",
) -> DataFrame:
    """LAION-style image-text alignment filtering census (Schuhmann et
    al. 2021, "LAION-400M": keep a crawled (image, caption) pair iff
    its CLIP cosine similarity clears a threshold — 0.3 for LAION-400M,
    0.28 for LAION-5B). Input is a PAIRED frame: one row per candidate
    pair carrying both embedding columns (the shape a web-scale
    multimodal crawl actually lands in its pair parquet), plus a
    grouping label (source/shard/language bucket). Returns one census
    row per label: (label, n_pairs, n_scored, n_aligned,
    frac_aligned6, avg_sim6, min_sim6, max_sim6).

    A pair with a zero-norm side is unscorable (an all-black image or
    empty caption from a broken fetch): its similarity is NULL — it
    counts in n_pairs but never in n_scored/n_aligned, and the NULL
    convention is explicit (a CASE guard) rather than riding on any
    engine's division/NaN behavior, so the DuckDB oracle can restate
    it exactly.

    Scale shape: ZERO joins and zero broadcasts — similarity is an
    in-row fold over the two array columns (same `_dot` the rest of
    the module uses), then ONE map-side-combined groupBy on the
    bounded label domain. The only shuffle is the #labels-row partial
    aggregate exchange; at 100 TB this is a single full scan at disk
    bandwidth, embarrassingly parallel."""
    dot = _dot(img_col, txt_col)
    ni = F.sqrt(_dot(img_col, img_col))
    nt = F.sqrt(_dot(txt_col, txt_col))
    sim = F.when((ni > 0) & (nt > 0), dot / (ni * nt))
    scored = pairs.select(F.col(label_col).alias("label"), sim.alias("sim"))
    agg = scored.groupBy("label").agg(
        F.count("*").alias("n_pairs"),
        F.count("sim").alias("n_scored"),
        F.sum(
            F.when(F.col("sim") >= threshold, 1).otherwise(0)
        ).alias("n_aligned"),
        F.round(F.avg("sim"), 6).alias("avg_sim6"),
        F.round(F.min("sim"), 6).alias("min_sim6"),
        F.round(F.max("sim"), 6).alias("max_sim6"),
    )
    return agg.select(
        "label",
        "n_pairs",
        "n_scored",
        "n_aligned",
        F.round(
            F.col("n_aligned") / F.nullif(F.col("n_scored"), F.lit(0)), 6
        ).alias("frac_aligned6"),
        "avg_sim6",
        "min_sim6",
        "max_sim6",
    )


def _centroid_frame(centroids: DataFrame) -> DataFrame:
    """(cell_id, embedding) -> broadcastable (cell_id, cvec, cnorm)."""
    return with_norm(
        centroids.select("cell_id", F.expr(VEC_EXPR).alias("cvec")),
        vec_col="cvec",
        out="cnorm",
    )


def _sided_assignment(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment carrying the bitext ``side`` flag:
    the :func:`_assign_to_cells` in-row argmax (broadcast packed
    centroids, no explode join, no window, no exchange) with one extra
    carried column. Shared by batch mining and the streaming
    assign-on-ingest store so the two cannot drift."""
    return _assign_to_cells(
        base.select("vec_id", "side", "vec", "norm"), cents
    )


def bitext_mine(
    emb: DataFrame,
    n_cells: int = 8,
    k: int = 4,
    threshold: float = 1.05,
    side=None,
    centroids: DataFrame | None = None,
    index=None,
) -> DataFrame:
    """Margin-based bitext candidate mining (Artetxe & Schwenk 2019,
    "Margin-based Parallel Corpus Mining with Multilingual Sentence
    Embeddings"; the CCMatrix recipe, Schwenk et al. 2021): align two
    monolingual corpora embedded in a shared space by scoring candidate
    pairs with the RATIO margin

        margin(x, y) = cos(x, y) / ((avgk(x) + avgk(y)) / 2)

    where ``avgk(v)`` is the mean cosine of v's k nearest candidates on
    the OPPOSITE side — the local-density normalizer that fixes the
    hubness failure of raw-cosine mining. ``side`` is any 0/1 integer
    Column (0 = source, 1 = target) — a real pipeline passes its
    language flag, e.g. ``F.col("lang") == "de"``, cast to int; the
    default (label parity: even = source, odd = target) is the gate's
    stand-in for two languages. For each source vector the best-margin
    target
    is kept when its margin clears ``threshold``; ``mutual`` marks
    pairs that are also the target's best source (the paper's
    intersection strategy). Returns (src_id, tgt_id, cos6, margin6,
    mutual), one row per mined source.

    Scale shape — cell-blocked, never all-pairs: every vector assigns
    to one of ``n_cells`` broadcast centroids (first-n_cells-vectors
    convention of :func:`semantic_dedup`; pass ``centroids`` — a
    (cell_id, embedding) frame, e.g. trained k-means — to override, in
    which case ``n_cells`` is ignored; or pass ``index`` — an
    :class:`~audit_star_spark.analytics.ivf_index.IVFIndex` — to mine
    straight off persisted assignments with zero training jobs), and
    candidates are the CELL EQUI-JOIN of
    opposite sides — pair count is bounded by the largest cell, the
    same blocking the paper's FAISS index performs. avgk uses those
    cell-blocked neighbors (the paper's own denominator is approximate
    kNN). Both per-side kNN averages and both argmaxes run through the
    two-phase partial top-k (:func:`_topk_per_query` — map-side
    k-truncation before any exchange, no query-partitioned window over
    an unpruned stream). The candidate and margined frames are
    persisted (each feeds 2-3 consumers; without it the assignment
    windows + cell join recompute ~5x — at scale these would be writes
    to scratch storage, the operators/ids.py convention).

    Determinism: every float is a sequential double fold; avgk sums
    the top-k cosines in RANK order (engines disagree on unordered
    float sums); argmax ties break on partner id; cos/margin round to
    6 dp only at the output boundary while the threshold compares the
    raw (bit-identical) margin — the float-portability conventions of
    this module. NaN cosines (zero-norm vectors) are dropped by the
    _topk_per_query guard, mirrored in the oracle."""
    if n_cells < 1 or k < 1:
        raise ValueError(f"n_cells and k must be >= 1, got {n_cells}, {k}")
    if side is None:
        side = F.col("label") % 2
    if index is not None:
        # train-once / probe-many (the semantic_dedup convention): the
        # persisted cell assignments replace both the centroid broadcast
        # and the assignment scan; emb/n_cells/centroids are ignored and
        # ``side`` is evaluated over the assignment frame (vec_id, label)
        assigned = (
            index.assignments(emb.sparkSession)
            .withColumn("side", side)
            .select("vec_id", "side", "vec", "norm", "cell_id")
        )
        return _bitext_mine_from_assigned(assigned, k, threshold)
    from audit_star_spark.util import spread

    # side is evaluated against the RAW input (before projection), so a
    # caller's language column works even though the vector pipeline
    # only carries (vec_id, side, vec, norm) forward
    base = with_norm(
        spread(emb.withColumn("side", side)).select(
            "vec_id", "side", F.expr(VEC_EXPR).alias("vec")
        )
    )
    if centroids is None:
        cents = base.filter(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell_id"),
            F.col("vec").alias("cvec"),
            F.col("norm").alias("cnorm"),
        )
    else:
        cents = _centroid_frame(centroids)
    assigned = _sided_assignment(base, cents)
    return _bitext_mine_from_assigned(assigned, k, threshold)


def _bitext_mine_from_assigned(
    assigned: DataFrame, k: int, threshold: float
) -> DataFrame:
    """The margin-mining core over an assigned (vec_id, side, vec, norm,
    cell_id) frame — shared by :func:`bitext_mine` and the streaming
    store's mine-at-read so batch and stream cannot drift."""
    src = assigned.filter(F.col("side") == 0).select(
        F.col("vec_id").alias("src_id"),
        F.col("vec").alias("svec"),
        F.col("norm").alias("snorm"),
        "cell_id",
    )
    tgt = assigned.filter(F.col("side") == 1).select(
        F.col("vec_id").alias("tgt_id"),
        F.col("vec").alias("tvec"),
        F.col("norm").alias("tnorm"),
        "cell_id",
    )
    cos = _dot("svec", "tvec") / (F.col("snorm") * F.col("tnorm"))
    # The candidate frame feeds three consumers (both avgk directions and
    # the margin join) and the margined frame feeds both argmaxes —
    # persist so the assignment windows + cell join run ONCE, not 5x (at
    # scale this would be a write to scratch storage; persist suffices —
    # the operators/ids.py convention).
    pairs = (
        src.join(tgt, "cell_id")
        .select("src_id", "tgt_id", cos.alias("cos"))
        .filter(~F.isnan("cos"))
        .persist()
    )

    def _avgk(cand: DataFrame, qcol: str, out: str) -> DataFrame:
        # mean of the top-k cosines, summed in rank order (deterministic)
        topk = _topk_per_query(cand, k, [])
        fold = (
            "aggregate(transform(array_sort(collect_list(struct(rank, cosine))), "
            "t -> t.cosine), CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
        )
        return topk.groupBy("query_id").agg(
            (F.expr(fold) / F.count("*").cast("double")).alias(out)
        ).select(F.col("query_id").alias(qcol), out)

    src_avg = _avgk(
        pairs.select(
            F.col("src_id").alias("query_id"),
            F.col("tgt_id").alias("vec_id"),
            F.col("cos").alias("cosine"),
        ),
        "src_id",
        "src_avg",
    )
    tgt_avg = _avgk(
        pairs.select(
            F.col("tgt_id").alias("query_id"),
            F.col("src_id").alias("vec_id"),
            F.col("cos").alias("cosine"),
        ),
        "tgt_id",
        "tgt_avg",
    )
    margin = F.col("cos") / ((F.col("src_avg") + F.col("tgt_avg")) / F.lit(2.0))
    margined = (
        pairs.join(src_avg, "src_id")
        .join(tgt_avg, "tgt_id")
        .select("src_id", "tgt_id", "cos", margin.alias("margin"))
        .persist()
    )
    best_fwd = _topk_per_query(
        margined.select(
            F.col("src_id").alias("query_id"),
            F.col("tgt_id").alias("vec_id"),
            F.col("margin").alias("cosine"),
            "cos",
        ),
        1,
        ["cos"],
    ).select(
        F.col("query_id").alias("src_id"),
        F.col("vec_id").alias("tgt_id"),
        "cos",
        F.col("cosine").alias("margin"),
    )
    best_bwd = _topk_per_query(
        margined.select(
            F.col("tgt_id").alias("query_id"),
            F.col("src_id").alias("vec_id"),
            F.col("margin").alias("cosine"),
        ),
        1,
        [],
    ).select(
        F.col("query_id").alias("tgt_id"), F.col("vec_id").alias("bsrc")
    )
    return (
        best_fwd.join(best_bwd, "tgt_id")
        .filter(F.col("margin") >= threshold)
        .select(
            "src_id",
            "tgt_id",
            F.round("cos", 6).alias("cos6"),
            F.round("margin", 6).alias("margin6"),
            (F.col("bsrc") == F.col("src_id")).alias("mutual"),
        )
    )
