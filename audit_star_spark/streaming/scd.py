"""Streaming-maintained SCD2 dimension store — the incremental twin of
``operators/scd.scd2_history`` (as LatestStateStore is to the live table
and EventRollup is to the batch rollup).

Store layout: one parquet partition per ``ingest_batch_id`` holding the
batch's event rows with per-column presence-TAGGED typed values from
BOTH diff maps (I/U version candidates AND D/T tombstones — tombstones
must persist, a later-arriving earlier event would otherwise resurrect a
closed interval's successor ordering). Dynamic partition overwrite makes
a replayed batch rewrite exactly its own partition — the repo's standard
exactly-once recipe. Because per-batch work is a pure per-row extraction
(no cross-event computation), ingestion is exact under ANY batch
partitioning of the feed, including out-of-order arrival.

``read()`` derives the table with the batch operator's exact value rule
(reconstruct.py B2/B5: ``change[c]`` if the event's change mentions c,
else the first LATER ``before_change`` containing c) plus the closing
lead() — all on ONE pk-keyed sort (single Exchange, stacked Windows,
plan-locked), over pre-extracted typed columns (maps parsed once at
ingest, not per query) and with no live-table join. ``compact()`` folds
partitions into a baseline; because the baseline keeps event rows (not
precomputed intervals), late events merge with no special casing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from audit_star_spark.catalog import TableSpec
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


class StreamingSCD2:
    """Maintain a type-2 dimension across micro-batches of audit events."""

    def __init__(self, store_path: str, spec: TableSpec):
        self.store_path = store_path
        self.spec = spec

    def ingest(
        self,
        log_stream: DataFrame,
        checkpoint: str,
        available_now: bool = True,
    ):
        # a compacted store is bound to its checkpoint lineage: a fresh
        # checkpoint restarts batch ids at 0 and visible() would silently
        # prune every new batch (store_compact module docstring)
        verify_lineage(self.store_path, checkpoint)

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        writer = log_stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        bind_lineage(self.store_path, str(query.id))
        return query

    def _typed(self, batch_df: DataFrame) -> DataFrame:
        # On U the change map holds ONLY the changed columns, and a
        # key whose insert predates capture has values recoverable only
        # from a LATER event's before_change (the delete's full old row)
        # — so the store keeps presence-TAGGED typed values from BOTH
        # maps (key-present-with-NULL-value must count as found, the
        # struct-tag trick from reconstruct.py), and read() applies the
        # batch operator's exact rule.
        def tag(m: str, c: str, t) -> F.Column:
            return F.when(
                F.expr(f"map_contains_key({m}, '{c}')"),
                F.struct(F.element_at(m, F.lit(c)).cast(t).alias("v")),
            )

        cols = [tag("change", c, t).alias(f"__c_{c}") for c, t in self.spec.columns]
        cols += [tag("before_change", c, t).alias(f"__b_{c}") for c, t in self.spec.columns]
        return batch_df.select(
            "audit_id",
            "primary_key",
            F.col("changed_at"),
            F.col("operation"),
            *cols,
        )

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """One idempotent micro-batch: typed extraction + partition write
        (exposed for replay testing)."""
        # a restarted query must roll an interrupted compaction swap
        # forward BEFORE re-creating the store dir — writing first would
        # make recovery mistake the fresh dir for the live store and
        # discard the folded baseline
        recover_store(self.store_path)
        (
            self._typed(batch_df)
            .withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id")
            .parquet(self.store_path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """The maintained SCD2 table — identical schema and contents to
        ``scd2_history`` over the same (payload) log."""
        recover_store(self.store_path)
        # replay safety: partitions of batches already folded into the
        # -1 baseline are pruned (a batch replayed after compaction
        # re-creates its partition NEXT TO the baseline copy; without
        # the filter every such event would exist twice and lead() would
        # emit duplicate / zero-length versions)
        ev = visible(
            spark.read.parquet(self.store_path),
            compacted_through(self.store_path),
        )
        # belt-and-braces audit_id dedup (keep the max-ingest_batch_id
        # copy): exact duplicates cannot survive the visibility filter,
        # but a store with out-of-contract history (e.g. hand-merged
        # dirs) must degrade to correct output, not silent double
        # versions. Same pk partitioning as the fill windows below ->
        # one extra Sort, zero extra Exchanges (plan-locked).
        w_dedup = Window.partitionBy("primary_key").orderBy(
            "audit_id", F.col("ingest_batch_id").desc()
        )
        ev = ev.withColumn("__prev_id", F.lag("audit_id").over(w_dedup)).filter(
            ~F.col("audit_id").eqNullSafe(F.col("__prev_id"))
        )
        w = Window.partitionBy("primary_key").orderBy("audit_id")
        w_next = w.rowsBetween(1, Window.unboundedFollowing)
        # the batch operator's exact value rule (reconstruct.py B2/B5):
        # change[c] if the event's change mentions c, else the FIRST
        # later before_change containing c; next-before + lead share ONE
        # pk sort (same partitioning/ordering -> one Exchange)
        filled = [
            F.coalesce(
                F.col(f"__c_{c}"),
                F.first(F.col(f"__b_{c}"), ignorenulls=True).over(w_next),
            )["v"].alias(c)
            for c, _ in self.spec.columns
        ]
        return (
            ev.select(
                "audit_id",
                "primary_key",
                "changed_at",
                "operation",
                *filled,
            )
            .withColumn("valid_to", F.lead("changed_at").over(w))
            .withColumn("__next_id", F.lead("audit_id").over(w))
            .filter(~F.col("operation").isin("D", "T"))
            .select(
                F.col("audit_id").alias("version_audit_id"),
                "primary_key",
                *[F.col(c) for c, _ in self.spec.columns],
                F.col("changed_at").alias("valid_from"),
                "valid_to",
                F.col("__next_id").isNull().alias("is_current"),
            )
        )

    def compact(self, spark: SparkSession) -> None:
        """Fold all live batch partitions into one ``ingest_batch_id=-1``
        baseline — bounds read-side partition fan-in. Event rows (incl.
        tombstones) are kept verbatim, so post-compaction batches and
        late events need no interval surgery. Crash-atomic: the baseline
        streams from the live store's lineage into a temp dir and is
        installed by rename (store_compact.atomic_swap) — every crash
        window leaves pre- OR post-compaction contents readable, and
        nothing is materialized in session memory. The recorded
        ``compacted_through`` makes a later replay of a folded batch
        invisible to read(). Run between triggers, like log compaction."""
        recover_store(self.store_path)
        ct = compacted_through(self.store_path)
        live = visible(spark.read.parquet(self.store_path), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = live.withColumn("ingest_batch_id", F.lit(BASELINE_ID))
        compact_partitioned_store(self.store_path, merged, new_ct)
