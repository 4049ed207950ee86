"""Mergeable HyperLogLog distinct-count sketches (Flajolet et al. 2007;
the HLL practice write-up is Heule et al. 2013).

Spark's built-in ``approx_count_distinct`` is HLL too, but its sketch
state lives inside the aggregation buffer — it cannot be persisted,
merged across micro-batches, or cross-checked by another engine. This
module keeps the sketch in the DATA MODEL instead: a register is a row
``(group, idx, rho_max)``, so

- building is two hash aggregations (map-side combined);
- MERGING is just ``max`` grouped by (group, idx) — partial sketches
  from different batches/partitions/days combine exactly, which is what
  the streaming store (streaming/sketch.py) leans on;
- every value is deterministic integer math off md5 (the repo's
  cross-engine hash), so a DuckDB oracle reproduces the registers AND
  the estimate bit-for-bit — an auditable approximate count.

Register math (m = 256, b = 8): h = 60-bit md5-derived integer;
``idx = h % m``; the remaining 52-bit window ``w = h // m`` yields
``rho = 53 - length(bin(w))`` (leading zeros + 1; 53 when w = 0).
Estimator: ``alpha_m * m^2 / S`` with
``S = (m - n_hit) + sum(2^-rho_max)`` folded over the SORTED register
list (float addition is order-sensitive at the last ulp; sorted folds
are bit-stable on any engine at any parallelism — the char_entropy
recipe), with the standard linear-counting small-range correction
``m * ln(m / zeros)`` when ``est <= 2.5m`` and zeros remain.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_M = 256
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# standard error 1.04/sqrt(m) — the 4-sigma contract bound the gate uses
HLL_RSE = 1.04 / (HLL_M ** 0.5)


def _hash_expr(value_col: str) -> str:
    return (
        f"CAST(conv(substring(md5(CAST({value_col} AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT)"
    )


def hll_partials(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Per group: the hit registers ``(keys..., idx, rho_max)`` — the
    mergeable sketch rows. Two map-side-combined hash aggregations; at
    most ``m`` rows per group survive regardless of input size."""
    h = F.expr(_hash_expr(value_col))
    staged = df.filter(F.col(value_col).isNotNull()).select(
        *keys,
        (h % HLL_M).alias("idx"),
        F.expr(
            f"CASE WHEN {_hash_expr(value_col)} div {HLL_M} = 0 THEN 53 "
            f"ELSE 53 - length(bin({_hash_expr(value_col)} div {HLL_M})) END"
        ).alias("rho"),
    )
    return staged.groupBy(*keys, "idx").agg(F.max("rho").alias("rho_max"))


def hll_merge(partials_a: DataFrame, partials_b: DataFrame) -> DataFrame:
    """Union two partial-sketch relations and re-maximize — the exact
    merge (HLL registers combine by max)."""
    keys = [c for c in partials_a.columns if c not in ("idx", "rho_max")]
    return (
        partials_a.unionByName(partials_b)
        .groupBy(*keys, "idx")
        .agg(F.max("rho_max").alias("rho_max"))
    )


def hll_estimate(partials: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Partial-sketch rows -> (keys..., est_distinct double, n_hit,
    zeros). Deterministic: the 2^-rho mass folds over the sorted
    register list."""
    folded = partials.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_hit"),
        F.expr(
            "aggregate(array_sort(collect_list(rho_max)), CAST(0.0 AS DOUBLE),"
            " (s, r) -> s + pow(2.0, -r))"
        ).alias("hit_mass"),
    )
    m = float(HLL_M)
    s_col = (F.lit(m) - F.col("n_hit")) + F.col("hit_mass")
    raw = F.lit(HLL_ALPHA * m * m) / s_col
    zeros = (F.lit(HLL_M) - F.col("n_hit")).cast("long")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(m) * F.log(F.lit(m) / zeros.cast("double")),
    ).otherwise(raw)
    return folded.select(
        *keys,
        F.round(est, 6).alias("est_distinct"),
        "n_hit",
        zeros.alias("zeros"),
    )


def hll_distinct(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """One-shot grouped approximate distinct count (build + estimate)."""
    return hll_estimate(hll_partials(df, keys, value_col), keys)


def hll_sql(
    table: str, keys: Sequence[str], value_col: str
) -> str:
    """DuckDB mirror: identical register construction and sorted-fold
    estimator — the oracle reproduces the estimate bit-for-bit."""
    ks = ", ".join(keys)
    h = (
        f"('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT"
    )
    m = float(HLL_M)
    return f"""
WITH hashed AS (
  SELECT {ks}, {h} % {HLL_M} AS idx,
         CASE WHEN {h} // {HLL_M} = 0 THEN 53
              ELSE 53 - length(bin({h} // {HLL_M})) END AS rho
  FROM {table} WHERE {value_col} IS NOT NULL
),
regs AS (
  SELECT {ks}, idx, MAX(rho) AS rho_max FROM hashed GROUP BY {ks}, idx
),
folded AS (
  SELECT {ks}, CAST(COUNT(*) AS BIGINT) AS n_hit,
         list_reduce(
           list_concat([CAST(0.0 AS DOUBLE)], list_sort(list(rho_max))),
           (s, r) -> s + pow(2.0, -r)) AS hit_mass
  FROM regs GROUP BY {ks}
)
SELECT {ks},
       round(CASE WHEN CAST({HLL_ALPHA * m * m!r} AS DOUBLE)
                         / ((CAST({m!r} AS DOUBLE) - n_hit) + hit_mass)
                       <= CAST({2.5 * m!r} AS DOUBLE)
                  AND {HLL_M} - n_hit > 0
             THEN CAST({m!r} AS DOUBLE)
                    * ln(CAST({m!r} AS DOUBLE) / ({HLL_M} - n_hit))
             ELSE CAST({HLL_ALPHA * m * m!r} AS DOUBLE)
                    / ((CAST({m!r} AS DOUBLE) - n_hit) + hit_mass)
             END, 6) AS est_distinct,
       n_hit,
       CAST({HLL_M} - n_hit AS BIGINT) AS zeros
FROM folded
"""


# ------------------------------------------------- KMV / theta sketches

KMV_K = 256
KMV_H = 1 << 60  # md5-derived hash space (15 hex chars)


def kmv_partials(
    df: DataFrame, keys: Sequence[str], value_col: str, k: int = KMV_K
) -> DataFrame:
    """Per group: the k smallest DISTINCT value hashes, sorted —
    (keys..., hs array<bigint>). A KMV (bottom-k) sketch: mergeable by
    union+re-truncate, and it answers set operations (union AND
    intersection) that HLL registers cannot.

    Scale shape: distinct (group, hash) rows first (one dedup shuffle),
    then a per-group bottom-k window — the sketch never buffers a
    group's full distinct set in one aggregation buffer."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    h = F.expr(_hash_expr(value_col))
    distinct = (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        distinct.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("h")).alias("hs"))
    )


def kmv_merge_expr(a: str, b: str, k: int = KMV_K) -> F.Column:
    """In-row merge of two sketch arrays: union, dedup, re-truncate."""
    return F.expr(f"slice(array_sort(array_distinct(concat({a}, {b}))), 1, {k})")


def kmv_estimate_expr(hs: str, k: int = KMV_K) -> F.Column:
    """Distinct-count estimate from a sketch array: exact |hs| while the
    set fits (the sketch IS the distinct hash set, modulo md5
    collisions); otherwise the classic (k-1)/theta with
    theta = kth smallest / H."""
    return F.expr(
        f"CASE WHEN size({hs}) < {k} THEN CAST(size({hs}) AS DOUBLE) "
        f"ELSE ({k} - 1) * CAST({KMV_H} AS DOUBLE) / element_at({hs}, {k}) END"
    )


def kmv_intersection_expr(a: str, b: str, k: int = KMV_K) -> F.Column:
    """Theta-sketch intersection estimate: with theta the smaller
    sketch threshold, |A ∩ B ∩ [0, theta)| / theta — all in-row."""
    theta = (
        f"least(CASE WHEN size({a}) < {k} THEN CAST({KMV_H} AS DOUBLE) "
        f"ELSE CAST(element_at({a}, {k}) AS DOUBLE) END, "
        f"CASE WHEN size({b}) < {k} THEN CAST({KMV_H} AS DOUBLE) "
        f"ELSE CAST(element_at({b}, {k}) AS DOUBLE) END)"
    )
    inter = (
        f"size(filter(array_intersect({a}, {b}), x -> x < {theta}))"
    )
    return F.expr(f"{inter} * CAST({KMV_H} AS DOUBLE) / {theta}")


def kmv_sql_partials(
    table: str, keys: Sequence[str], value_col: str, k: int = KMV_K
) -> str:
    """DuckDB mirror of kmv_partials (bit-identical arrays)."""
    ks = ", ".join(keys)
    h = f"('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT"
    return f"""
SELECT {ks}, list_sort(list(h)) AS hs FROM (
  SELECT {ks}, h, row_number() OVER (PARTITION BY {ks} ORDER BY h) AS rn
  FROM (SELECT DISTINCT {ks}, {h} AS h FROM {table}
        WHERE {value_col} IS NOT NULL)
) WHERE rn <= {k} GROUP BY {ks}
"""
