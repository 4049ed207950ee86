"""Bucketed physical layout — shuffle-free joins and windows.

The reference leans on btree indexes to make its per-pk correlated rescans
cheap (audit.go:836–837). The Spark-scale analogue is *bucketing*: write a
table hash-partitioned into N buckets by the join/window key and sorted
within buckets. A scan of that table then already satisfies the
distribution (and sort) that a join or window on the key requires, so
Catalyst plans **no Exchange** — the single most expensive node at 100 TB.

Two uses here:

- :func:`write_bucketed` / :func:`read_bucketed` — generic co-located
  layout for any fact/dim pair that joins repeatedly on the same key
  (both sides bucketed with the same count → a sort-merge join with zero
  shuffle on either side).
- :func:`stage_log_bucketed` — the audit log bucketed by ``primary_key``
  and sorted by ``(primary_key, audit_id)``: the reconstruction views'
  window (SURVEY B2) runs directly on the scan with no Exchange and no
  Sort, which is exactly what the reference's `(primary_key, audit_id)`
  btree buys it, amortized across every view query.

Bucket counts: pick ~(total size / target partition size) and keep it
fixed across writers so joins stay co-located; at 100 TB that is
thousands of buckets — the same code path, different constant.

Sort propagation: bucketing alone removes the Exchange. To also drop the
window/merge-join Sort, readers must trust the in-bucket sort order —
set ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (readers
distrust it by default since SPARK-28595 because multi-file buckets
break the guarantee; :func:`write_bucketed` writes exactly one file per
bucket precisely so the guarantee holds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Stage ``df`` as a bucketed table in the session catalog. Idempotent
    per (table, layout): re-running overwrites."""
    # one writer task per bucket -> exactly one file per bucket: Spark
    # only propagates the in-bucket sort order to readers when a bucket
    # is a single file, and the sort is what removes the window's Sort
    # node downstream
    df = df.repartition(n_buckets, bucket_col)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    w = w.sortBy(*(sort_cols or [bucket_col]))
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def stage_log_bucketed(
    spark: SparkSession,
    log: DataFrame,
    table: str = "audit_log_bucketed",
    n_buckets: int = 8,
    path: str | None = None,
) -> DataFrame:
    """Stage an audit log bucketed by primary_key, sorted by
    (primary_key, audit_id). Reconstruction windows over the result plan
    with no Exchange and no Sort (asserted in tests/test_bucketing.py)."""
    write_bucketed(
        log,
        table,
        bucket_col="primary_key",
        n_buckets=n_buckets,
        sort_cols=["primary_key", "audit_id"],
        path=path,
    )
    return spark.table(table)
