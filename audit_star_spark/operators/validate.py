"""Data-validation rule engine: declarative expectation checks over any
frame — the quality gate a production pipeline runs between stages
(null/ range/ format/ uniqueness/ referential integrity), reported as
one row per rule with its violation count.

Scale shape: every row-level predicate AND every uniqueness check folds
into ONE aggregate over ONE scan (conditional sums + count-distincts,
map-side combined); the per-rule rows come from an in-plan struct
explode of that 1-row aggregate — never a scan per rule. Foreign-key
rules are the only extra passes: one anti-join count each, with the
reference side broadcast when small (dimension tables — the common FK
shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from audit_star_spark.util import qcol


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", qcol(col).isNull()


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """NULLs don't violate range rules — compose with not_null to forbid
    them (SQL three-valued logic, same convention as CHECK constraints)."""
    return (
        f"in_range({col}, {lo}, {hi})",
        qcol(col).isNotNull() & ~qcol(col).between(lo, hi),
    )


def matches(col: str, pattern: str) -> tuple[str, Column]:
    return f"matches({col})", qcol(col).isNotNull() & ~qcol(col).rlike(pattern)


def check_rules(
    df: DataFrame,
    row_rules: list[tuple[str, Column]] = (),
    unique_cols: list[str] = (),
    foreign_keys: list[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Evaluate every rule; returns (rule, n_violations, passed).

    ``row_rules``: (name, violation-condition) pairs from the helpers
    above (or any boolean Column). ``unique_cols``: violation count =
    rows minus distinct values (NULLs count as one value, like a
    DISTINCT query — not like a SQL UNIQUE constraint). ``foreign_keys``:
    (col, ref_df, ref_col) — non-null values absent from the reference.
    """
    if not (row_rules or unique_cols or foreign_keys):
        raise ValueError("no rules given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_name, cond) in enumerate(row_rules):
        aggs.append(F.coalesce(F.sum(F.when(cond, 1)), F.lit(0)).alias(f"__r{i}"))
    for c in unique_cols:
        aggs.append(F.count_distinct(qcol(c)).alias(f"__u_{c}"))
        aggs.append(F.count(F.when(qcol(c).isNull(), 1)).alias(f"__un_{c}"))
    one = df.agg(*aggs)

    rows = []
    for i, (name, _cond) in enumerate(row_rules):
        rows.append((name, F.col(f"__r{i}")))
    for c in unique_cols:
        # distinct counts ignore NULLs, so add the null bucket back as
        # one value when present
        n_distinct = F.col(f"__u_{c}") + F.least(F.col(f"__un_{c}"), F.lit(1))
        rows.append((f"unique({c})", F.col("__n") - n_distinct))
    report = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        cnt.cast("long").alias("n_violations"),
                    )
                    for name, cnt in rows
                ]
            )
        ).alias("p")
    ).select("p.*")

    for col, ref_df, ref_col in foreign_keys:
        ref = ref_df.select(qcol(ref_col).alias(col)).distinct()
        missing = (
            df.select(qcol(col).alias(col))
            .filter(qcol(col).isNotNull())
            .join(F.broadcast(ref), col, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(
                F.lit(f"foreign_key({col})").alias("rule"), "n_violations"
            )
        )
        report = report.unionByName(missing)
    return report.withColumn("passed", F.col("n_violations") == 0)
