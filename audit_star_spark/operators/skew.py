"""Skew-safe join and aggregation helpers.

AQE's skew-join split (``spark.sql.adaptive.skewJoin``) handles most hot
keys at runtime and is ON in this engine's sessions — reach for these
helpers only when a key is SO hot that even a split partition overwhelms
one task's build side, or when AQE is unavailable (streaming foreachBatch
plans, broadcast-disabled shapes).

- :func:`salted_join`: replicate the small side R times, salt the big
  side uniformly — turns one hot hash bucket into R buckets at the cost
  of an R-times-larger build side. Exact same rows as a plain inner/left
  equi-join.
- :func:`two_phase_count`: partial aggregation on (key, salt) then final
  on key — the classic hot-key count/sum shape. Spark's hash aggregation
  already does map-side partials, so this only wins when a single key's
  partials still funnel into one reducer with heavy per-group state
  (e.g. distinct accumulation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from audit_star_spark.util import qcol

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on column ``on``, salted to spread
    each join key over ``salt_buckets`` shuffle buckets.

    The big side gets a uniform random-ish salt derived from a stable row
    expression (hash of all columns -> deterministic, no rand() so plans
    stay replayable); the small side is exploded once per salt value.
    Shuffle volume: big side unchanged, small side x salt_buckets.
    """
    if salt_buckets < 1:
        # pmod(x, 0) is NULL and sequence(0, -1) is the DESCENDING
        # [0, -1] — a zero bucket count would silently drop every row
        # from the join instead of failing
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    big_salted = big.withColumn(
        SALT, F.pmod(F.hash(*[qcol(c) for c in big.columns]), F.lit(salt_buckets))
    )
    small_salted = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_salted.join(small_salted, [on, SALT], how)
    return out.drop(SALT)


def two_phase_count(
    df: DataFrame,
    key: str,
    agg_col: Column,
    alias: str,
    salt_buckets: int = 32,
) -> DataFrame:
    """groupBy(key).agg(sum(agg_col)) computed as (key, salt) partials then
    a final combine — bounds any single reducer's group size. The salt
    hashes the WHOLE row (hashing the key would put a hot key's rows back
    into one bucket)."""
    salted = df.withColumn(
        SALT, F.pmod(F.hash(*[qcol(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial = salted.groupBy(key, SALT).agg(F.sum(agg_col).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").alias(alias))


def heavy_hitters(df: DataFrame, keys: list[str], k: int = 10) -> DataFrame:
    """Exact top-``k`` hottest key values: per value its row count, share
    of all rows, and skew ratio (count / mean-rows-per-distinct-key) —
    the diagnostic that decides whether AQE's split is enough or
    :func:`salted_join` is warranted (ratio >> salt_buckets means one
    key still floods a task after salting).

    Scale shape: one keyed count aggregate (map-side combined), a 1-row
    global aggregate broadcast back, and TakeOrderedAndProject for the
    top-k — no total sort, no second scan. Ties break deterministically
    (count desc, then key ascending)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = df.groupBy(*[qcol(c) for c in keys]).agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").cast("long").alias("__total"),
        F.count("*").cast("long").alias("__nkeys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            F.col("n"),
            (F.col("n").cast("double") / F.col("__total").cast("double")).alias(
                "share"
            ),
            (
                (F.col("n") * F.col("__nkeys")).cast("double")
                / F.col("__total").cast("double")
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("n").desc(), *keys)
        .limit(k)
    )


def heavy_hitters_sampled(
    df: DataFrame,
    keys: list[str],
    row_id: str,
    k: int = 10,
    rate_pct: int = 10,
    salt: str = "hh",
) -> DataFrame:
    """Sampled heavy-hitter certification — the scan-budget scale path
    for :func:`heavy_hitters` (the profile_distinct_contract recipe):
    estimate each hot key's count from a deterministic ``rate_pct``%
    row sample, compare against the exact count, and flag whether the
    estimate lands inside the 4-sigma binomial contract

        |est - n| <= 4 * sqrt(n * (100/rate_pct - 1))

    (sampled count ~ Binomial(n, p); est = sampled/p has variance
    n*(1-p)/p). At 100 TB the exact side is what you drop: the sample
    scan is ``rate_pct``% of the I/O and the contract query certifies
    the estimator's error ONCE at validation scale, exactly like the
    HLL distinct-count gate. The sample is keyed on md5(row_id) — the
    same engine-independent bucket family as the split/mix operators —
    so the oracle reproduces it bit-for-bit.

    Returns the exact top-``k`` keys with (n, est_n, within_contract);
    ties break count desc then key asc."""
    if not 1 <= rate_pct <= 100:
        raise ValueError(f"rate_pct must be in [1, 100], got {rate_pct}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    bucket = F.expr(
        f"CAST(conv(substring(md5(CAST({row_id} AS STRING) || ':{salt}'), 1, 15), "
        "16, 10) AS BIGINT) % 100"
    )
    exact = df.groupBy(*[qcol(c) for c in keys]).agg(F.count("*").alias("n"))
    sampled = (
        df.filter(bucket < F.lit(rate_pct))
        .groupBy(*[qcol(c) for c in keys])
        .agg((F.count("*") * (100.0 / rate_pct)).alias("est_n"))
    )
    scale = 100.0 / rate_pct
    return (
        exact.join(sampled, keys, "left")
        .select(
            *keys,
            "n",
            F.coalesce(F.col("est_n"), F.lit(0.0)).alias("est_n"),
            (
                F.abs(F.coalesce(F.col("est_n"), F.lit(0.0)) - F.col("n"))
                <= 4.0 * F.sqrt(F.col("n").cast("double") * (scale - 1.0))
            ).alias("within_contract"),
        )
        .orderBy(F.col("n").desc(), *[qcol(c) for c in keys])
        .limit(k)
    )
