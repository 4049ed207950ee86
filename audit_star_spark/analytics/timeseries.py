"""Time-series operators over the ``events`` table: dense resampling with
gap fill + last-observation-carried-forward, and an ordered conversion
funnel. The reference's schema-versioned views have no time-series surface
(its temporal op is the audit as-of lookup, audit.go:1073–1080); these are
the hypertable-rollup-style operators an event pipeline adds on top.

Scale design: everything aggregates BEFORE it densifies. The raw event
stream is reduced per (event_type, bucket) with map-side partial
aggregation (one shuffle keyed by the group), and only then joined to the
generated spine — so the spine join and the LOCF window run over
|types| x |buckets| rows (time-bounded, thousands), never over raw events.
The funnel is per-user conditional aggregation: three groupBys on the same
user_id key (co-partitioned exchanges, AQE-coalesced) and a tiny rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = {"hour": "interval 1 hour", "day": "interval 1 day"}


def _cents(col: str) -> F.Column:
    # exact integer cents (HALF_UP decimal cast, identical in DuckDB):
    # double sums are summation-order-sensitive at the last ulp; integer
    # sums are associative, so any partial-aggregation order is bit-exact
    return (F.col(col).cast("decimal(18,2)") * 100).cast("long")


def resample_events(events: DataFrame, bucket: str = "hour") -> DataFrame:
    """Dense per (event_type, bucket) series over the full observed time
    range: ``n_events``/``total_value`` (0 on gap buckets), ``is_gap``, and
    ``avg_value_locf`` — the bucket's average value with gaps filled by the
    last observed bucket's average (NULL until a type's first observation).

    The spine is generated from a 1-row global min/max aggregate
    broadcast-crossed with the distinct type set, so gap buckets exist on
    any engine regardless of which buckets have data.
    """
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKETS)}, got {bucket!r}")
    agg = events.groupBy(
        "event_type", F.date_trunc(bucket, F.col("ts")).alias("bucket")
    ).agg(
        F.count("*").alias("__n"),
        F.sum(_cents("value")).alias("__sv"),
    )
    bounds = events.agg(
        F.date_trunc(bucket, F.min("ts")).alias("__lo"),
        F.date_trunc(bucket, F.max("ts")).alias("__hi"),
    )
    spine = (
        events.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.expr(f"sequence(__lo, __hi, {_BUCKETS[bucket]})")
            ).alias("bucket"),
        )
    )
    dense = spine.join(agg, ["event_type", "bucket"], "left")
    # exact average from integer cents: sv/100/n with one final division
    avg = F.col("__sv").cast("double") / 100.0 / F.col("__n").cast("double")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return dense.select(
        "event_type",
        "bucket",
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_events"),
        (F.coalesce(F.col("__sv"), F.lit(0)).cast("double") / 100.0).alias(
            "total_value"
        ),
        F.col("__n").isNull().alias("is_gap"),
        F.last(avg, ignorenulls=True).over(w).alias("avg_value_locf"),
    )


def _sql_str(s: str) -> str:
    """Escape for a single-quoted Spark SQL literal (backslashes first —
    Spark applies C-style escapes inside string literals)."""
    return s.replace("\\", "\\\\").replace("'", "''")


def event_funnel(events: DataFrame, stages: list[str]) -> DataFrame:
    """Ordered conversion funnel: per stage, how many users reached it —
    a user reaches stage k iff they have a ``stages[k]`` event strictly
    after their (earliest qualifying) stage k-1 event. Output:
    (stage_idx, stage, n_users, conversion_rate vs previous stage).

    Single-pass design (r4 — replaces the per-stage join cascade, which
    was |stages| shuffle joins against a shrinking frame): ONE shuffle
    keyed on user_id collects each user's ts-sorted stage events, an
    in-row left fold walks them greedily — (depth, t) advances when the
    next event matches stages[depth] strictly after t, which reproduces
    the min-timestamp recurrence exactly because events arrive in
    ascending ts order — and a global conditional aggregate turns
    per-user depths into per-stage reach counts. The greedy fold and the
    oracle's min-based CTE cascade are provably the same function, and
    the oracle (unchanged) locks it.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    n = len(stages)
    stage_arr = "array(" + ", ".join(f"'{_sql_str(s)}'" for s in stages) + ")"
    per_user = (
        events.filter(F.col("event_type").isin(list(stages)))
        .select("user_id", "ts", F.col("event_type").alias("et"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("ts", "et"))).alias("evs"))
    )
    depth = F.expr(
        f"""aggregate(
              evs,
              named_struct('depth', 0, 't', CAST(NULL AS TIMESTAMP)),
              (s, e) -> CASE
                WHEN s.depth < {n}
                 AND e.et = element_at({stage_arr}, s.depth + 1)
                 AND (s.depth = 0 OR e.ts > s.t)
                THEN named_struct('depth', s.depth + 1, 't', e.ts)
                ELSE s END
            ).depth"""
    )
    # no depth >= 1 filter: depth-0 users satisfy none of the conditional
    # counts below, and a filter on the computed column would re-inline
    # the fold into the scan predicate (evaluated twice per user)
    depths = per_user.select(depth.alias("depth"))
    one_row = depths.agg(
        *[
            F.count(F.when(F.col("depth") >= i + 1, 1))
            .cast("long")
            .alias(f"__n_{i}")
            for i in range(n)
        ]
    )
    out = one_row.selectExpr(
        f"stack({n}, "
        + ", ".join(
            f"{i + 1}, '{_sql_str(st)}', __n_{i}" for i, st in enumerate(stages)
        )
        + ") as (stage_idx, stage, n_users)"
    )
    # global window over a |stages|-row frame — not a data-scale window
    w = Window.orderBy("stage_idx")
    prev = F.lag("n_users").over(w)
    return out.select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(
            F.col("n_users").cast("double")
            / F.nullif(prev, F.lit(0)).cast("double"),
            9,
        ).alias("conversion_rate"),
    )


def retention_cohorts(events: DataFrame, max_weeks: int = 8) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, and for
    each week offset 0..max_weeks how many of that cohort were active —
    the canonical product-analytics rollup.

    Scale shape: ONE scan and ONE user-keyed exchange — collect_set
    dedups each user's active weeks with map-side partial aggregation,
    an in-row transform turns the sorted week set into offsets from its
    minimum (the cohort week), and the explode feeds the tiny
    (cohort_week, offset) grid aggregate. Distinct weeks map to distinct
    offsets (UTC Mondays are exactly 7 days apart), so the grid count is
    a plain count, no per-group distinct. No window over raw events, no
    join, no per-offset scan loop (plan-locked)."""
    week_secs = 7 * 24 * 3600
    per_user = (
        events.select("user_id", F.date_trunc("week", F.col("ts")).alias("week"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("week")).alias("weeks"))
    )
    rows = per_user.select(
        F.col("weeks")[0].alias("cohort_week"),
        F.explode(
            F.expr(
                "transform(weeks, w -> CAST(floor((unix_timestamp(w) - "
                f"unix_timestamp(weeks[0])) / {week_secs}) AS INT))"
            )
        ).alias("week_offset"),
    )
    return (
        rows.filter(F.col("week_offset") <= max_weeks)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def rate_anomalies(
    events: DataFrame,
    bucket: str = "hour",
    trailing: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per (event_type, bucket) event-rate anomaly flags: a bucket is
    anomalous when its count deviates from the TRAILING window's mean by
    more than ``z_threshold`` sample standard deviations. Runs over the
    densely resampled series (gap buckets count 0 — a dead feed IS an
    anomaly), so the window sees |types| x |buckets| rows, never raw
    events. Buckets with fewer than 3 trailing observations or zero
    variance are never flagged (z undefined); z is rounded to 9 dp so
    the flag and value are engine-stable."""
    series = resample_events(events, bucket=bucket).select(
        "event_type", "bucket", F.col("n_events").cast("double").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-trailing, -1)
    )
    mu = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    cnt = F.count("n").over(w)
    z = F.round((F.col("n") - mu) / sd, 9)
    return series.select(
        "event_type",
        "bucket",
        F.col("n").cast("long").alias("n_events"),
        F.when((cnt >= 3) & (sd > 0), z).alias("z_score"),
        F.coalesce((cnt >= 3) & (sd > 0) & (F.abs(z) > z_threshold), F.lit(False)).alias(
            "is_anomaly"
        ),
    )
