"""Incrementally-maintained materialized rollup: keep a grouped
aggregate (e.g. daily event stats) up to date as micro-batches arrive,
without ever rescanning history — the streaming twin of the batch
``daily_event_stats`` shape and the analytics analog of the audit views'
LatestStateStore.

Design: each micro-batch writes its PARTIAL aggregate (decomposable
metrics only: counts and integer-cent sums) to a parquet store
partitioned by ``ingest_batch_id`` with dynamic partition overwrite —
so a replayed batch (data landed, checkpoint commit lost) rewrites
exactly its own partition instead of double-counting, the same
exactly-once recipe as the streaming quality gate. The read side merges
partials with one tiny aggregate over |batches| x |groups| rows; a
``compact()`` folds them back to one partition when the partial count
grows. Non-decomposable metrics (count-distinct) belong in a different
operator (LatestStateStore-style keyed state), not here — refusing them
is part of the contract.

At 100 TB: partials are group-grid-sized (days x types), not data-sized;
the store rewrite per batch is KBs. History is never rescanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audit_star_spark.streaming.store_compact import (
    BASELINE_ID,
    bind_lineage,
    compact_partitioned_store,
    compacted_through,
    max_live_batch,
    recover_store,
    verify_lineage,
    visible,
)


def _cents(col: str) -> F.Column:
    return (F.col(col).cast("decimal(18,2)") * 100).cast("long")


def _batch_partial(batch_df: DataFrame) -> DataFrame:
    return batch_df.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(_cents("value")).alias("sum_cents"),
    )


class EventRollup:
    """Maintain per-(day, event_type) counts/sums across micro-batches."""

    def __init__(self, store_path: str):
        self.store_path = store_path

    def ingest(self, events_stream: DataFrame, checkpoint: str, available_now: bool = True):
        # a compacted store is bound to its checkpoint lineage: a fresh
        # checkpoint restarts batch ids at 0 and visible() would silently
        # prune every new batch (store_compact module docstring)
        verify_lineage(self.store_path, checkpoint)

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        writer = events_stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        bind_lineage(self.store_path, str(query.id))
        return query

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """One idempotent micro-batch (exposed for replay testing)."""
        # roll an interrupted compaction swap forward before touching the
        # store dir (see store_compact module docstring)
        recover_store(self.store_path)
        (
            _batch_partial(batch_df)
            .withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id")
            .parquet(self.store_path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """The maintained rollup: merge all partials — the only scan is
        over the tiny partial store, never the event history."""
        recover_store(self.store_path)
        # drop partitions of batches already folded into the baseline: a
        # partial aggregate replayed after compaction would otherwise be
        # counted twice (once inside -1, once under its own batch id)
        partials = visible(
            spark.read.parquet(self.store_path),
            compacted_through(self.store_path),
        )
        return partials.groupBy("day", "event_type").agg(
            F.sum("n_events").cast("long").alias("n_events"),
            (F.sum("sum_cents").cast("double") / 100.0).alias("total_value"),
        )

    def compact(self, spark: SparkSession) -> None:
        """Fold accumulated partials into a single ``ingest_batch_id=-1``
        baseline partition and drop the per-batch ones — bounds read-side
        fan-in. Crash-atomic temp-dir + rename swap (store_compact):
        every crash window leaves pre- OR post-compaction contents
        readable, and the recorded ``compacted_through`` keeps a batch
        replayed after compaction from double-counting. Must not race a
        live ingest; run between triggers, like log compaction."""
        recover_store(self.store_path)
        ct = compacted_through(self.store_path)
        live = visible(spark.read.parquet(self.store_path), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = (
            live.groupBy("day", "event_type")
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("sum_cents").cast("long").alias("sum_cents"),
            )
            .withColumn("ingest_batch_id", F.lit(BASELINE_ID))
        )
        compact_partitioned_store(self.store_path, merged, new_ct)
