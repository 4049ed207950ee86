"""DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
Optimizing Data Mixtures Speeds Up Language Model Pretraining") — the
Group-DRO exponentiated-gradient update over per-domain EXCESS LOSS
(proxy loss minus reference loss, clamped at 0), the published recipe
for choosing pretraining mixture weights:

    alpha'_d  = alpha_d * exp(lr * excess_d)        (multiplicative step)
    alpha''   = alpha' / sum(alpha')                (project to simplex)
    alpha     = (1 - s) * alpha'' + s / D           (uniform smoothing)

iterated ``n_steps`` times from the uniform start; the paper's output
is the AVERAGE alpha over steps (more stable than the last iterate).

This engine's variant scores excess loss ONCE (no proxy retraining —
the proxy here is any per-document NLL column, e.g. the repo's bigram
or KN perplexity; the reference is the uniform-LM baseline ln V), then
replays the exact update arithmetic. That keeps the whole computation
+,-,*,/ and exp over D-row frames — the oracle replays every step, the
same bit-portability argument as PCA power iteration and HITS.

Scale shape: excess aggregation is one domain-keyed pass over the
scored corpus (group = docs per domain — corpus-proportional, so it
honors ``bit_exact``, functions/folds.py); the update loop is D-row
frames with a 1-row broadcast normalizer, constant-size regardless of
corpus, materialized per round (iter_materialize) like every iterative
operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.functions.folds import SORTED_FOLD, fold_sum
from audit_star_spark.plans.iterate import iter_materialize


def domain_excess_loss(
    scored: DataFrame,
    ref_nll: "F.Column | float",
    domain_col: str = "source",
    nll_col: str = "avg_nll",
    bit_exact: bool = True,
) -> DataFrame:
    """(domain, n_docs, excess): per-domain mean proxy NLL minus the
    reference NLL, clamped at 0 (Group-DRO only upweights domains the
    proxy is WORSE than the reference on). Documents with NULL proxy
    scores (token-poor) are excluded from the mean but counted."""
    ref = F.lit(float(ref_nll)) if not isinstance(ref_nll, F.Column) else ref_nll
    per = scored.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr(
            fold_sum(f"CASE WHEN {nll_col} IS NULL THEN 0.0 "
                     f"ELSE {nll_col} END", bit_exact)
        ).alias("nll_sum"),
        F.sum(F.when(F.col(nll_col).isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_scored"),
    )
    return per.select(
        "domain",
        "n_docs",
        F.greatest(
            F.lit(0.0),
            F.when(
                F.col("n_scored") > 0,
                F.col("nll_sum") / F.col("n_scored") - ref,
            ).otherwise(F.lit(0.0)),
        ).alias("excess"),
    )


def doremi_weights(
    excess: DataFrame,
    n_steps: int = 4,
    lr: float = 1.0,
    smoothing: float = 0.1,
) -> DataFrame:
    """Exponentiated-gradient mixture weights from a (domain, excess)
    frame: (domain, final_weight, avg_weight) — avg_weight is the
    DoReMi output (mean alpha over steps), final_weight the last
    iterate. All folds are D-row groups (bounded by the domain count),
    so they stay sorted in every mode."""
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    if not 0 <= smoothing < 1:
        raise ValueError(f"smoothing must be in [0, 1), got {smoothing}")
    # materialize the D-row excess frame ONCE: its lineage is a full
    # corpus scan (the proxy-LM scoring), and the count below plus every
    # update step would otherwise replay it (the covariance/pagerank
    # materialization rule)
    base = iter_materialize(excess.select("domain", "excess"))
    n_domains = base.count()  # bounded: one scalar, the domain count
    if n_domains == 0:
        raise ValueError("empty excess frame: no domains to weight")
    w = base.select("domain", F.lit(1.0 / n_domains).alias("w"))
    steps = None
    for _ in range(n_steps):
        un = w.join(F.broadcast(base), "domain").select(
            "domain", (F.col("w") * F.exp(F.lit(float(lr)) * F.col("excess"))).alias("uw")
        )
        z = un.agg(F.expr(SORTED_FOLD.format("uw")).alias("z"))
        w = iter_materialize(
            un.crossJoin(F.broadcast(z)).select(
                "domain",
                (
                    F.lit(1.0 - smoothing) * F.col("uw") / F.col("z")
                    + F.lit(smoothing / n_domains)
                ).alias("w"),
            )
        )
        steps = w if steps is None else steps.unionByName(w)
    avg = steps.groupBy("domain").agg(
        (F.expr(SORTED_FOLD.format("w")) / F.lit(float(n_steps))).alias(
            "avg_weight"
        )
    )
    return w.select("domain", F.col("w").alias("final_weight")).join(
        avg, "domain"
    )


def doremi_sql_iterations(
    excess_cte: str, n_steps: int = 4, lr: float = 1.0, smoothing: float = 0.1
) -> str:
    """DuckDB mirror of :func:`doremi_weights`, unrolled — ``excess_cte``
    must define a CTE named ``excess`` with columns (domain, excess).
    Returns a query whose result is (domain, final_weight, avg_weight),
    replaying the identical sorted folds and update arithmetic."""
    fold = (
        "list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
        "list_sort(list({0}))), (s, v) -> s + v)"
    )
    parts = [
        excess_cte,
        "nd AS (SELECT CAST(count(*) AS DOUBLE) AS d FROM excess)",
        "w0 AS (SELECT domain, 1.0 / nd.d AS w FROM excess CROSS JOIN nd)",
    ]
    for t in range(1, n_steps + 1):
        parts.append(
            f"u{t} AS (SELECT e.domain, w{t - 1}.w * exp({float(lr)!r} * "
            f"e.excess) AS uw FROM excess e JOIN w{t - 1} USING (domain))"
        )
        parts.append(
            f"z{t} AS (SELECT {fold.format('uw')} AS z FROM u{t})"
        )
        parts.append(
            f"w{t} AS (SELECT domain, {1.0 - smoothing!r} * uw / z{t}.z + "
            f"{float(smoothing)!r} / nd.d AS w "
            f"FROM u{t} CROSS JOIN z{t} CROSS JOIN nd)"
        )
    union = "\n  UNION ALL\n  ".join(
        f"SELECT domain, w FROM w{t}" for t in range(1, n_steps + 1)
    )
    parts.append(f"allw AS (\n  {union}\n)")
    parts.append(
        f"avgw AS (SELECT domain, {fold.format('w')} / {float(n_steps)!r} "
        "AS avg_weight FROM allw GROUP BY domain)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT w{n_steps}.domain, w{n_steps}.w AS final_weight, "
        "avgw.avg_weight\n"
        f"FROM w{n_steps} JOIN avgw USING (domain)"
    )
