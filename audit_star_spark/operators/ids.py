"""Gapless monotone sequence assignment — the Spark answer to the
reference's ``nextval(seq)`` (audit.go:855–867, 881; SURVEY §7 hard part 1).

``monotonically_increasing_id`` is neither gapless nor stable, and a global
``row_number()`` window funnels the whole dataset through ONE partition — a
non-starter at 100 TB. The scale path here is the classic two-pass scheme
(what RDD ``zipWithIndex`` does, kept in DataFrame/Arrow land):

1. range-partition + sort by a total order key (so global order is the sort
   order regardless of where partition boundaries fall);
2. count rows per partition (cheap metadata job);
3. mapInPandas adds ``base_offset[pid] + local_index`` — a narrow pass.

Determinism: given a *total* order key (unique, e.g. an event id), the
assigned ids equal ``row_number() over (order by key)`` exactly, independent
of partition boundaries or cluster size.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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

    mode='distributed' (default): two-pass scheme above — no global funnel.
    mode='window': single global window; only for small inputs/tests.
    """
    if mode == "window":
        w = Window.orderBy(*[F.col(c) for c in order_by])
        return df.withColumn(id_col, F.row_number().over(w) + F.lit(start - 1))

    import pandas as pd  # local import: worker-side deps stay lazy

    num_partitions = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(num_partitions, *order_by).sortWithinPartitions(
        *order_by
    )
    part = part.withColumn("__pid", F.spark_partition_id())
    # Freeze the staged partitioning: the count job (pass 1) and the id job
    # (pass 2) must observe the SAME partition boundaries. At real scale
    # this would be a write to scratch storage; locally persist suffices.
    part = part.persist()
    # Pass 1: per-partition counts -> cumulative base offsets (tiny collect:
    # O(num_partitions) rows of metadata, not data).
    counts = {
        r["__pid"]: r["cnt"]
        for r in part.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql import types as T

    # copy — StructType.add would mutate the input frame's schema in place
    schema = T.StructType(
        list(part.schema.fields) + [T.StructField(id_col, T.LongType(), False)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                pdf[id_col] = pd.Series([], dtype="int64")
                yield pdf
                continue
            pid = int(pdf["__pid"].iloc[0])
            base = offsets[pid] + seen.get(pid, 0)
            pdf = pdf.copy()
            pdf[id_col] = range(base, base + len(pdf))
            seen[pid] = seen.get(pid, 0) + len(pdf)
            yield pdf

    return part.mapInPandas(assign, schema=schema).drop("__pid")
