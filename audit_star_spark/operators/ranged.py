"""Ranged (interval) aggregate join — count/aggregate right-side rows whose
timestamp falls in a per-left-row window ``[left_ts + lower, left_ts + upper)``
sharing an equi-key. The reference has no range join (its only temporal
lookup, audit.go:1073–1080, is the as-of "first later event" which
operators/asof.py covers with a single window); this is the attribution /
feature-window shape an event pipeline needs.

Scale design: NEVER the naive theta-join (|L|x|R| candidates per key before
the range filter — a BroadcastNestedLoopJoin at Spark level). Instead the
classic bucketed range join:

- right rows land in fixed-width time buckets (one narrow projection);
- each left row replicates to the few buckets its window overlaps
  (``ceil(window/bucket) + 1`` copies, an in-row explode);
- one equi shuffle join on (keys…, bucket) bounds candidates to rows in
  overlapping buckets; the exact range predicate filters inside the join;
- a partial-aggregating count collapses pairs map-side.

Replication factor is a planning choice: ``bucket_s`` defaults to the
window width, i.e. ≤ 2 copies per left row. All candidate generation is
bucketed, so the plan has no nested-loop node at any scale (locked in
tests/test_plans.py), and AQE's skew split applies to the one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranged_count_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    bucket_s: float | None = None,
    counts: dict[str, F.Column | None] | None = None,
    carry_right: tuple[str, ...] = (),
    right_prefix: str = "r_",
    aggregates: dict[str, F.Column] | None = None,
) -> DataFrame:
    """For each (distinct) left row, count — and optionally aggregate —
    right rows with matching ``keys`` and
    ``left_ts + lower_s <= right_ts < left_ts + upper_s``.

    ``counts`` maps output column name -> optional boolean condition over
    the carried right columns (referenced as ``F.col(f"{right_prefix}<name>")``
    for every name in ``carry_right``); ``None`` counts every in-range row.
    Default output column is ``n_in_range``. Left rows with no match get 0.

    ``aggregates`` maps output column name -> an arbitrary aggregate
    expression (sum/min/max/avg/count/...) over the carried right columns.
    Before aggregation every carried column is masked to NULL for
    out-of-range candidate rows, so any null-skipping aggregate sees ONLY
    the in-range rows — same bucketed plan, still no nested-loop node.
    Left rows with no in-range match get the aggregate's empty value
    (NULL for sum/min/max; wrap in coalesce yourself if you need 0).

    Left rows must be distinct (the final aggregate groups by all left
    columns to restore the pre-explode row set; duplicate left rows would
    merge). Carried right columns are prefixed to avoid clashing with left
    column names.
    """
    if upper_s <= lower_s:
        raise ValueError(f"empty window: [{lower_s}, {upper_s})")
    if bucket_s is None:
        bucket_s = upper_s - lower_s
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be positive, got {bucket_s}")
    counts = counts or {"n_in_range": None}
    bucket_us = int(bucket_s * 1_000_000)
    lower_us = int(lower_s * 1_000_000)
    upper_us = int(upper_s * 1_000_000)

    r2 = right.select(
        *keys,
        F.floor(F.unix_micros(F.col(right_ts)) / bucket_us).alias("__b"),
        F.unix_micros(F.col(right_ts)).alias("__rts"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in carry_right],
    )
    left_cols = list(left.columns)
    l2 = (
        left.withColumn("__lo", F.unix_micros(F.col(left_ts)) + F.lit(lower_us))
        .withColumn("__hi", F.unix_micros(F.col(left_ts)) + F.lit(upper_us))
        # window is half-open and non-empty, so __hi - 1 >= __lo always:
        # the sequence is ascending (no descending-sequence phantom rows)
        .withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.floor(F.col("__lo") / bucket_us),
                    F.floor((F.col("__hi") - 1) / bucket_us),
                )
            ),
        )
    )
    joined = l2.join(r2, [*keys, "__b"], "left")
    in_range = (F.col("__rts") >= F.col("__lo")) & (F.col("__rts") < F.col("__hi"))
    aggs = []
    for name, cond in counts.items():
        hit = in_range if cond is None else (in_range & cond)
        aggs.append(
            F.coalesce(F.sum(F.when(hit, 1)), F.lit(0)).cast("long").alias(name)
        )
    if aggregates:
        # mask carried columns so null-skipping aggregates only see
        # in-range rows; the user expression then applies unchanged
        for c in carry_right:
            joined = joined.withColumn(
                f"{right_prefix}{c}",
                F.when(in_range, F.col(f"{right_prefix}{c}")),
            )
        aggs.extend(expr.alias(name) for name, expr in aggregates.items())
    return joined.groupBy(*left_cols).agg(*aggs)
