"""Table profiling: one-scan per-column summary statistics (null counts,
distinct counts, typed min/max) — the DESCRIBE/SUMMARY surface an
analytics engine owes its users, over ANY input frame.

Scale shape: ONE pass builds every per-column aggregate in a single
groupBy-less agg (Spark plans the multiple exact count-distincts via one
Expand + partial aggregation — rows × |columns| intermediates, map-side
combined). The per-column rows come from unpivoting the 1-row aggregate
driver-side — never a per-column scan loop. Exact distinct counts are the
oracle-checkable choice; at 100 TB swap ``exact_distinct=False`` for
``approx_count_distinct`` (HLL, one pass, no Expand) and drop the
cross-engine hash check — the trade is documented, not implied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """One row per profiled column: (column, dtype, n_rows, n_nulls,
    n_distinct, num_min, num_max, str_min, str_max, ts_min, ts_max).
    Typed min/max land in the slot matching the column family (numerics
    cast to double; booleans/arrays/maps report counts only)."""
    cols = columns or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    unknown = [c for c in cols if c not in fields]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    # String min/max have variable-length aggregation buffers, which
    # disqualify HashAggregate — mixed into the multi-countDistinct agg
    # they force the Expand(rows x |cols|+1) rewrite into SortAggregate
    # with a full sort of the expanded input on every grouping key. Keep
    # them in a SEPARATE 1-row aggregate over just the string columns
    # (parquet prunes to those columns), joined back onto the hash-
    # friendly aggregate: the Expand path stays all-primitive-buffer and
    # hash-aggregates, and no corpus-sized sort is ever planned.
    str_aggs: list[F.Column] = []
    per_col: list[tuple[str, str]] = []  # (name, dtype string)
    for c in cols:
        dt = fields[c]
        qc = F.col(f"`{c}`")
        aggs.append(F.count(F.when(qc.isNull(), 1)).alias(f"__nn_{c}"))
        nd = (
            F.countDistinct(qc)
            if exact_distinct
            else F.approx_count_distinct(qc)
        )
        aggs.append(nd.alias(f"__nd_{c}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(qc).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(qc).cast("double").alias(f"__max_{c}"))
        elif isinstance(dt, T.StringType):
            str_aggs.append(F.min(qc).alias(f"__min_{c}"))
            str_aggs.append(F.max(qc).alias(f"__max_{c}"))
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            aggs.append(F.min(qc).cast("timestamp").alias(f"__min_{c}"))
            aggs.append(F.max(qc).cast("timestamp").alias(f"__max_{c}"))
        # report the canonical family name: whether the session read the
        # parquet TIMESTAMP as LTZ or NTZ is a session setting, not a
        # property of the data
        per_col.append((c, dt.simpleString().replace("timestamp_ntz", "timestamp")))

    one = df.agg(*aggs)
    if str_aggs:
        one = one.crossJoin(df.agg(*str_aggs))

    # unpivot the 1-row aggregate into per-column rows: a driver-side
    # union of 1-row selects over the SAME materialized aggregate would
    # re-run the scan per column — instead select per-column structs and
    # explode, keeping the single pass
    rows = []
    for c, dt in per_col:
        is_num = isinstance(fields[c], _NUMERIC)
        is_str = isinstance(fields[c], T.StringType)
        is_ts = isinstance(
            fields[c], (T.TimestampType, T.TimestampNTZType, T.DateType)
        )
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dt).alias("dtype"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                (F.col(f"__min_{c}") if is_num else F.lit(None).cast("double")).alias("num_min"),
                (F.col(f"__max_{c}") if is_num else F.lit(None).cast("double")).alias("num_max"),
                (F.col(f"__min_{c}") if is_str else F.lit(None).cast("string")).alias("str_min"),
                (F.col(f"__max_{c}") if is_str else F.lit(None).cast("string")).alias("str_max"),
                (F.col(f"__min_{c}") if is_ts else F.lit(None).cast("timestamp")).alias("ts_min"),
                (F.col(f"__max_{c}") if is_ts else F.lit(None).cast("timestamp")).alias("ts_max"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def numeric_histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bucket, lo_edge,
    hi_edge, n). NULLs are dropped; the top edge is inclusive (the max
    value lands in the last bucket, the standard fixed-width convention).

    Scale shape: when bounds aren't given, ONE 1-row min/max aggregate
    broadcasts back over the scan (no driver round-trip in the plan);
    bucketing is a projection and the histogram is a |bins|-row hash
    aggregate with map-side combine. Two scans total with derived
    bounds, one with explicit bounds."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    x = F.col(col).cast("double")
    vals = df.select(x.alias("__x")).filter(F.col("__x").isNotNull())
    if lo is None or hi is None:
        bounds = vals.agg(
            F.min("__x").alias("__lo"), F.max("__x").alias("__hi")
        )
        staged = vals.crossJoin(F.broadcast(bounds))
    else:
        staged = vals.withColumn("__lo", F.lit(float(lo))).withColumn(
            "__hi", F.lit(float(hi))
        )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    raw = F.floor((F.col("__x") - F.col("__lo")) / F.nullif(width, F.lit(0.0)))
    # coalesce BEFORE clamping: Spark's least/greatest skip NULLs, so a
    # NULL raw bucket (constant column, width 0) would otherwise escape
    # the clamp as bins-1. Clamp both ends — with explicit bounds,
    # out-of-range values land in the edge buckets.
    bucket = F.greatest(
        F.lit(0), F.least(F.lit(bins - 1), F.coalesce(raw, F.lit(0)))
    )
    return (
        staged.select(
            bucket.cast("int").alias("bucket"),
            (F.col("__lo") + bucket * width).alias("lo_edge"),
            (F.col("__lo") + (bucket + 1) * width).alias("hi_edge"),
        )
        .groupBy("bucket", "lo_edge", "hi_edge")
        .agg(F.count("*").cast("long").alias("n"))
    )


def profile_distinct_contract(
    df: DataFrame,
    columns: list[str] | None = None,
    rsd: float = 0.05,
    sigmas: float = 4.0,
    abs_slack: int = 4,
) -> DataFrame:
    """Error-contract gate for the approx (HLL) profiling path: per
    column, the exact row/null counts plus ``nd_ok`` — whether
    ``approx_count_distinct``'s estimate lands within ``sigmas`` x the
    advertised relative standard deviation of the EXACT distinct count
    (with a small absolute slack for tiny cardinalities, where HLL++'s
    sparse mode is exact but the bound itself degenerates).

    This is the ``price_percentiles_approx`` recipe applied to HLL: the
    raw estimate cannot hash-match a cross-engine oracle (different
    sketches), but the algorithm's own contract CAN be checked
    deterministically — the oracle emits TRUE constants. ONE scan
    computes the exact and approx distincts side by side (the HLL
    aggregates ride the same Expand the exact multi-distinct plan
    already pays), and the per-column rows come from the same in-plan
    struct explode as profile_table."""
    cols = columns or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    unknown = [c for c in cols if c not in fields]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        qc = F.col(f"`{c}`")
        aggs.append(F.count(F.when(qc.isNull(), 1)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(qc).alias(f"__nd_{c}"))
        aggs.append(F.approx_count_distinct(qc, rsd).alias(f"__na_{c}"))
    one = df.agg(*aggs)
    rows = []
    for c in cols:
        tol = F.greatest(
            F.lit(sigmas * rsd) * F.col(f"__nd_{c}").cast("double"),
            F.lit(float(abs_slack)),
        )
        dt = fields[c].simpleString().replace("timestamp_ntz", "timestamp")
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dt).alias("dtype"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__nn_{c}").cast("long").alias("n_nulls"),
                (
                    F.abs(F.col(f"__na_{c}") - F.col(f"__nd_{c}")).cast("double")
                    <= tol
                ).alias("nd_ok"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
