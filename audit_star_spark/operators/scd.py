"""Slowly-changing-dimension type-2 history from the audit log.

The reference exposes point-in-time reconstruction as *views* the user
queries per timestamp (delta/snapshot/compare, audit.go:1051-1473). A
warehouse consumer of the same log usually wants the complementary
*materialized* shape: one row per **row version** with a validity
interval — the classic SCD2 dimension table — so any point-in-time join
becomes `valid_from <= t AND (valid_to > t OR valid_to IS NULL)` with no
window functions at query time.

Derivation is purely a reshape of the snapshot view (SURVEY §2B):

- every I/U event opens a version carrying the full reconstructed row
  state after that event (exactly the snapshot row);
- a version closes at the NEXT event of the same primary key — any op,
  including D/T: a delete closes the interval without opening one;
- a version with no later event is current (``is_current``); keys whose
  last event is D/T therefore have no current version, matching
  ``latest_state``.

Physical shape: the closing timestamp is ``lead(changed_at)`` over
``partitionBy(primary_key) orderBy(audit_id)`` — the SAME partitioning and
ordering as the reconstruction's next-later-before window, so Catalyst
plans ONE Exchange and stacks both Window nodes on the single pk sort
(locked in tests/test_plans.py). At 100 TB the output is bounded by the
log itself (<= one row per I/U event) and the only shuffle is the pk
shuffle reconstruction already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from audit_star_spark.catalog import TableSpec
from audit_star_spark.operators.reconstruct import snapshot_view


def scd2_history(
    log: DataFrame, live: DataFrame | None, spec: TableSpec, **kw
) -> DataFrame:
    """Type-2 dimension table: one row per row version with
    ``(valid_from, valid_to, is_current)``.

    Columns: ``version_audit_id`` (the event that opened the version),
    ``primary_key``, every table column at its reconstructed value during
    the interval, ``valid_from`` / ``valid_to`` (half-open
    ``[valid_from, valid_to)``; ``valid_to`` NULL while the version is
    open), ``is_current``.
    """
    snap = snapshot_view(log, live, spec, **kw)
    w = Window.partitionBy("primary_key").orderBy("audit_id")
    # lead() must see ALL events (a D/T closes the prior version), so the
    # window runs before the D/T filter drops the tombstone rows.
    return (
        snap.withColumn("valid_to", F.lead("audited_changed_at").over(w))
        .withColumn("__next_id", F.lead("audit_id").over(w))
        .filter(~F.col("audited_operation").isin("D", "T"))
        .select(
            F.col("audit_id").alias("version_audit_id"),
            "primary_key",
            *[F.col(c) for c, _ in spec.columns],
            F.col("audited_changed_at").alias("valid_from"),
            "valid_to",
            F.col("__next_id").isNull().alias("is_current"),
        )
    )


def scd2_at(history: DataFrame, ts) -> DataFrame:
    """Point-in-time slice of an SCD2 table: the row version of every key
    alive at ``ts`` — a plain filter, no windows, which is the whole point
    of materializing the intervals."""
    t = F.lit(ts).cast("timestamp")
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
