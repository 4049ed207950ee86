"""Gapless monotone sequence assignment — the Spark answer to the
reference's ``nextval(seq)`` (audit.go:855–867, 881; SURVEY §7 hard part 1).

``monotonically_increasing_id`` alone is neither gapless nor stable, and a
global ``row_number()`` window funnels the whole dataset through ONE
partition — a non-starter at 100 TB. The scale path is the classic
two-pass zipWithIndex scheme, kept entirely JVM-side:

1. range-partition + sort by a total-order key (global order then equals
   the sort order regardless of partition boundaries), persist to freeze
   the partitioning;
2. count rows per partition (tiny metadata collect) -> cumulative bases;
3. local row index = ``monotonically_increasing_id() - (pid << 33)``
   (mid is defined as ``pid * 2^33 + row-index-in-partition``), so
   ``id = base[pid] + local_index`` — a narrow projection + broadcast
   join, no shuffle, no Python workers, stays in whole-stage codegen.

Determinism: with a *total* order key (unique tie-breaker) the ids equal
``row_number() over (order by key)`` exactly, independent of partition
boundaries or cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from audit_star_spark.util import qcol

_MID_PARTITION_SHIFT = 33  # monotonically_increasing_id: pid * 2^33 + local


def gapless_ids(
    df: DataFrame,
    order_by: list[str],
    id_col: str = "audit_id",
    start: int = 1,
    mode: str = "distributed",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign a gapless, monotone id following the total order ``order_by``.

    ``order_by`` must be a total order (include a unique tie-breaker);
    otherwise ids are still gapless but tie order is partition-dependent.

    mode='distributed' (default): two-pass JVM scheme above — no global
    funnel, scales with partition count.
    mode='window': single global window; only for small inputs/tests.
    """
    if mode == "window":
        w = Window.orderBy(*[qcol(c) for c in order_by])
        return df.withColumn(id_col, F.row_number().over(w) + F.lit(start - 1))

    spark = df.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(num_partitions, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    # Freeze the staged partitioning: the count job (pass 1) and the id job
    # (pass 2) must observe the SAME partitions and row order. At real
    # scale this would be a write to scratch storage; persist suffices.
    part = part.persist()

    counts = {
        r["__pid"]: r["cnt"]
        for r in part.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    bases, acc = [], start
    for pid in sorted(counts):
        bases.append((pid, acc))
        acc += counts[pid]
    offsets = spark.createDataFrame(bases or [(0, start)], "__pid int, __base long")

    local_idx = F.col("__mid") - F.shiftleft(F.col("__pid").cast("long"), _MID_PARTITION_SHIFT)
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(id_col, F.col("__base") + local_idx)
        .drop("__pid", "__mid", "__base")
    )


def prefix_sums(
    df: DataFrame,
    value_col: str,
    order_by: list[str],
    out: str = "offset",
    mode: str = "distributed",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``value_col`` along the total order
    ``order_by`` (row's offset = sum of all strictly-earlier values) —
    the same two-pass scheme as :func:`gapless_ids`, generalized from
    counting rows to summing a column: a global running-sum window
    would funnel everything through one partition, so pass 1 collects
    ONE sum per partition (bounded metadata) into cumulative bases and
    pass 2 adds a WITHIN-partition running sum (the window is keyed on
    the partition id, so no Exchange SinglePartition appears — each
    window group is one already-sorted partition).

    Determinism: with a total ``order_by`` the result equals
    ``sum(value) over (order by ... rows between unbounded preceding
    and 1 preceding)`` exactly — integer values only (float prefix
    sums would depend on fold order)."""
    if mode == "window":
        w = (
            Window.orderBy(*[qcol(c) for c in order_by])
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return df.withColumn(
            out, F.coalesce(F.sum(value_col).over(w), F.lit(0)).cast("long")
        )

    spark = df.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(num_partitions, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
    )
    part = part.persist()
    sums = {
        r["__pid"]: r["s"]
        for r in part.groupBy("__pid")
        .agg(F.coalesce(F.sum(value_col), F.lit(0)).alias("s"))
        .collect()
    }  # bounded: one row per partition
    bases, acc = [], 0
    for pid in sorted(sums):
        bases.append((pid, acc))
        acc += int(sums[pid])
    offsets = spark.createDataFrame(bases or [(0, 0)], "__pid int, __base long")
    wl = (
        Window.partitionBy("__pid")
        .orderBy(*[qcol(c) for c in order_by])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(value_col).over(wl), F.lit(0))
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(out, (F.col("__base") + local).cast("long"))
        .drop("__pid", "__base")
    )
