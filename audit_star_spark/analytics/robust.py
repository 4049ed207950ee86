"""Robust embedding-center statistics — the GEOMETRIC MEDIAN by
Weiszfeld iteration (Weiszfeld 1937; the modern treatment is Cohen et
al. 2016 "Geometric Median in Nearly Linear Time"), the classic robust
alternative to the mean: a single far outlier moves the mean
arbitrarily but moves the geometric median almost not at all (breakdown
point 1/2). For embedding-ops this is the robust variant of the
All-but-the-Top centering question — "where is the corpus center, and
is the mean being dragged by junk vectors?".

    c_{t+1} = sum_x x / ||x - c_t||  /  sum_x 1 / ||x - c_t||

iterated a FIXED number of steps from the per-dimension mean, with the
standard epsilon floor on the distance (a point sitting exactly on the
current iterate would otherwise divide by zero; the floor turns the
update into the smoothed Weiszfeld step).

Why fixed-step Weiszfeld and not a solver: +,-,*,/ and sqrt only —
the PCA power-iteration portability argument — so the DuckDB oracle
replays every iteration bit-for-bit (under the gate's sorted folds).

Scale shape per iteration: ONE corpus pass — the broadcast 1-row
center joins in, each vector contributes (x_i/d) terms per dimension
and one 1/d weight, and the per-dimension sums partial-aggregate
map-side (group = corpus per dim, so the folds honor ``bit_exact``,
functions/folds.py). The center never exceeds one D-value row;
iterates materialize via iter_materialize (forked-DAG rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.pca import _mean_row
from audit_star_spark.analytics.similarity import VEC_EXPR, _vec_dim
from audit_star_spark.functions.folds import fold_sum
from audit_star_spark.plans.iterate import iter_materialize

D_EPS = 1e-12  # smoothed-Weiszfeld distance floor


def geometric_median(
    emb: DataFrame, n_iter: int = 3, bit_exact: bool = True
) -> DataFrame:
    """ONE-row frame with ``gm``: the geometric-median vector after
    ``n_iter`` Weiszfeld steps from the per-dimension mean."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    base = emb.select("vec_id", F.expr(VEC_EXPR).alias("vec"))
    n = base.count()
    if n == 0:
        raise ValueError("empty embedding corpus")
    c = iter_materialize(
        _mean_row(base, n, bit_exact).select(F.col("ml").alias("gm"))
    )
    for _ in range(n_iter):
        with_d = base.crossJoin(F.broadcast(c)).select(
            "vec",
            F.greatest(
                F.sqrt(
                    F.expr(
                        "aggregate(zip_with(vec, gm, (x, m) -> (x - m) * (x - m)), "
                        "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
                    )
                ),
                F.lit(D_EPS),
            ).alias("d"),
        )
        terms = with_d.select(
            F.posexplode(F.expr("transform(vec, x -> x / d)")).alias(
                "i", "xd"
            ),
            (F.lit(1.0) / F.col("d")).alias("w"),
        )
        num = terms.groupBy("i").agg(
            F.expr(fold_sum("xd", bit_exact)).alias("nu")
        )
        # the 1/d weight sum is duplicated D times by the explode; fold
        # it from the per-dimension i = 0 slice (one copy per vector)
        den = terms.filter(F.col("i") == 0).agg(
            F.expr(fold_sum("w", bit_exact)).alias("de")
        )
        c = iter_materialize(
            num.crossJoin(F.broadcast(den))
            .select("i", (F.col("nu") / F.col("de")).alias("g"))
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(i, g))), "
                    "x -> x.g)"
                ).alias("gm")
            )
        )
    return c


def robust_center_report(
    emb: DataFrame, n_iter: int = 3, bit_exact: bool = True
) -> DataFrame:
    """(dim, mean, gmedian, drag): the per-dimension mean vs the
    geometric median and their difference — ``drag`` is how far
    outliers pull the mean along each axis (zero for clean symmetric
    corpora, large exactly where junk vectors live)."""
    dim = _vec_dim(emb)
    base = emb.select("vec_id", F.expr(VEC_EXPR).alias("vec"))
    n = base.count()
    if n == 0:
        raise ValueError("empty embedding corpus")
    mean = _mean_row(base, n, bit_exact)
    gm = geometric_median(emb, n_iter=n_iter, bit_exact=bit_exact)
    spark = emb.sparkSession
    dims = spark.range(dim).select(F.col("id").cast("int").alias("dim"))
    return (
        dims.crossJoin(F.broadcast(mean))
        .crossJoin(F.broadcast(gm))
        .select(
            "dim",
            F.expr("element_at(ml, dim + 1)").alias("mean"),
            F.expr("element_at(gm, dim + 1)").alias("gmedian"),
            (
                F.expr("element_at(ml, dim + 1)")
                - F.expr("element_at(gm, dim + 1)")
            ).alias("drag"),
        )
    )
