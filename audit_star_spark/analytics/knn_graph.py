"""Approximate kNN-graph construction by neighbor-of-neighbor descent
(Dong, Moses & Li 2011, "Efficient K-Nearest Neighbor Graph
Construction for Generic Similarity Measures" — NN-Descent), the
standard way to build the all-nodes kNN graph that SemDeDup-style
curation, graph clustering and HNSW-class index builds start from,
WITHOUT the O(N^2) all-pairs scan:

1. SEED: ``k`` deterministic-random out-edges per node — the md5 of
   (vec_id, j) picks a non-self destination, the engine-portable
   stand-in for the paper's random initialization. (An LSH-bucket
   seed was measured and REJECTED here: a single hash table makes the
   seed graph a disjoint union of bucket cliques, and the descent can
   never escape a bucket — recall froze at the seed level. The random
   seed spans the space, which is exactly why the paper starts
   random.)
2. DESCEND: a neighbor of my neighbor is likely my neighbor — each
   round joins the SYMMETRIZED edge set with itself on the shared
   node (forward + reverse edges, the paper's B(v) ∪ R(v)), scores
   only the NEW pairs exactly (anti-join against current edges),
   unions and re-ranks top-k per node. Measured on the synthetic
   corpus (k=8): recall@8 0.02 seed -> 0.52 -> 0.69 -> 0.78 over
   three rounds.

Scale shape per round: two shuffles (the self-join and the rank
window) over O(N·k) edge rows with O(N·k^2) transient candidates —
never N^2; vectors are fetched for new candidates only, by two keyed
joins against the node table. Rounds materialize via iter_materialize
(forked-DAG rule). Determinism: md5 seeds + id tie-breaks, so the
DuckDB oracle replays the graph edge-for-edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from audit_star_spark.analytics.similarity import _dot, _prepared
from audit_star_spark.operators.ids import gapless_ids
from audit_star_spark.plans.iterate import iter_materialize


def _topk_per_src(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("src").orderBy(
        F.col("cosine").desc(), F.col("dst")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "rank", "dst", "cosine")
    )


def _seed_dst_expr(n: int, k: int) -> str:
    """k deterministic-random destinations per src: the md5-60bit of
    (src, j) offsets into the other n-1 ids, so dst != src always."""
    h = (
        "CAST(conv(substring(md5(CAST(src AS STRING) || ':' || "
        "CAST(j AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )
    return (
        f"transform(sequence(1, {k}), j -> "
        f"(src + 1 + {h} % ({n} - 1)) % {n})"
    )


def knn_graph(emb: DataFrame, k: int = 8, rounds: int = 2) -> DataFrame:
    """(src, rank, dst, cosine): the approximate kNN graph after the
    random seed plus ``rounds`` neighbor-of-neighbor refinement
    rounds."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    base = _prepared(emb)
    # the seed arithmetic (src + 1 + h % (n-1)) % n is a valid non-self
    # destination map ONLY over dense 0..n-1 ids: sparse or offset
    # vec_ids would alias seed destinations onto missing vertices and
    # the score join would silently drop them, leaving under-seeded
    # nodes. Probe density with one bounded aggregate; when ids are NOT
    # dense, rank them gapless first and translate back at the end (for
    # dense inputs — every driver table — the probe passes and the plan
    # is byte-identical to the direct path).
    prof = base.agg(
        F.count("*").alias("n"),
        F.min("vec_id").alias("lo"),
        F.max("vec_id").alias("hi"),
    ).collect()[0]
    n = prof["n"]  # bounded: one scalar row, the corpus size
    if n < 2:
        raise ValueError(f"need at least 2 vectors, got {n}")
    dense = prof["lo"] == 0 and prof["hi"] == n - 1
    if not dense:
        idmap = gapless_ids(
            base.select("vec_id").distinct(),
            order_by=["vec_id"],
            id_col="__nid",
            start=0,
        )
        base = (
            base.join(idmap, "vec_id")
            .drop("vec_id")
            .withColumnRenamed("__nid", "vec_id")
        )
    nodes = base.select("vec_id", "vec", "norm")
    ns = nodes.select(
        F.col("vec_id").alias("src"),
        F.col("vec").alias("svec"),
        F.col("norm").alias("snorm"),
    )
    nd = nodes.select(
        F.col("vec_id").alias("dst"),
        F.col("vec").alias("dvec"),
        F.col("norm").alias("dnorm"),
    )

    def score(cand: DataFrame) -> DataFrame:
        return cand.join(ns, "src").join(nd, "dst").select(
            "src",
            "dst",
            (_dot("svec", "dvec") / (F.col("snorm") * F.col("dnorm"))).alias(
                "cosine"
            ),
        )

    seeds = (
        base.select(F.col("vec_id").alias("src"))
        .select("src", F.explode(F.expr(_seed_dst_expr(n, k))).alias("dst"))
        .distinct()
    )
    edges = iter_materialize(_topk_per_src(score(seeds), k))
    for _ in range(rounds):
        # symmetrize: forward and reverse edges both feed the
        # neighbor-of-neighbor join (B(v) U R(v))
        und = (
            edges.select("src", "dst")
            .unionByName(
                edges.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
            .distinct()
        )
        l, r = und.alias("l"), und.alias("r")
        cand = (
            l.join(r, F.col("l.dst") == F.col("r.src"))
            .filter(F.col("l.src") != F.col("r.dst"))
            .select(F.col("l.src").alias("src"), F.col("r.dst").alias("dst"))
            .distinct()
            # only NEW pairs need scoring; existing edges keep their cosine
            .join(edges.select("src", "dst"), ["src", "dst"], "left_anti")
        )
        pool = edges.select("src", "dst", "cosine").unionByName(score(cand))
        edges = iter_materialize(_topk_per_src(pool, k))
    if not dense:
        back_s = idmap.select(
            F.col("__nid").alias("src"), F.col("vec_id").alias("__src_id")
        )
        back_d = idmap.select(
            F.col("__nid").alias("dst"), F.col("vec_id").alias("__dst_id")
        )
        edges = (
            edges.join(back_s, "src")
            .join(back_d, "dst")
            .select(
                F.col("__src_id").alias("src"),
                "rank",
                F.col("__dst_id").alias("dst"),
                "cosine",
            )
        )
    return edges


def knn_graph_recall(
    emb: DataFrame, k: int = 8, rounds: int = 2, n_eval: int = 8
) -> DataFrame:
    """(src, n_hits, recall): graph quality for the first ``n_eval``
    nodes — fraction of each node's EXACT top-k found among its graph
    out-edges (the NN-Descent convergence metric)."""
    g = knn_graph(emb, k=k, rounds=rounds).filter(F.col("src") < n_eval)
    base = _prepared(emb)
    q = base.filter(F.col("vec_id") < n_eval).select(
        F.col("vec_id").alias("src"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    joined = base.join(F.broadcast(q), F.col("vec_id") != F.col("src"))
    cos = _dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst"))
    exact = (
        joined.select("src", F.col("vec_id").alias("dst"), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst")
    )
    ge = g.select("src", "dst").withColumn("__hit", F.lit(1))
    return (
        exact.join(ge, ["src", "dst"], "left")
        .groupBy("src")
        .agg(F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_hits"))
        .select(
            "src",
            "n_hits",
            (F.col("n_hits").cast("double") / float(k)).alias("recall"),
        )
    )
