"""Incrementally maintained distinct-count sketches: the HLL register
rows (analytics/sketch.py) ARE mergeable state, so maintaining a
grouped approximate distinct over an arriving stream needs no custom
stateful operator — per micro-batch write the batch's partial
registers to a batch-id partition (idempotent dynamic overwrite, the
EventRollup pattern), and read() re-maximizes registers across
partitions before estimating. The store holds at most
``groups x m`` rows per batch regardless of event volume — register
partials, never raw events.

compact() folds the per-batch partitions into one baseline via the
crash-atomic swap (store_compact); folding is the same groupBy-max the
read path runs, so it is idempotent and replay-safe by construction
(the recorded compacted_through prunes a replayed folded batch).
Checkpoint-lineage binding as in every other store.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audit_star_spark.analytics.sketch import hll_estimate, hll_partials
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


class StreamingHLL:
    """Grouped approximate distinct count over a stream, maintained as
    persisted mergeable HLL register partials."""

    def __init__(self, store_path: str, keys: Sequence[str], value_col: str):
        self.store_path = store_path
        self.keys = list(keys)
        self.value_col = value_col

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        recover_store(self.store_path)
        (
            hll_partials(batch_df, self.keys, self.value_col)
            .withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id")
            .parquet(self.store_path)
        )

    def ingest(self, stream: DataFrame, checkpoint: str, available_now: bool = True):
        verify_lineage(self.store_path, checkpoint)

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        writer = stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        bind_lineage(self.store_path, str(query.id))
        return query

    def _merged(self, spark: SparkSession) -> DataFrame:
        recover_store(self.store_path)
        regs = visible(
            spark.read.parquet(self.store_path),
            compacted_through(self.store_path),
        )
        return regs.groupBy(*self.keys, "idx").agg(
            F.max("rho_max").alias("rho_max")
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """(keys..., est_distinct, n_hit, zeros) over everything
        ingested so far — identical to the batch sketch of the full
        history (the merge law, test-locked)."""
        return hll_estimate(self._merged(spark), self.keys)

    def compact(self, spark: SparkSession) -> None:
        """Fold per-batch register partials into one baseline partition
        (crash-atomic swap; replayed folded batches pruned)."""
        recover_store(self.store_path)
        ct = compacted_through(self.store_path)
        live = visible(spark.read.parquet(self.store_path), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = (
            live.groupBy(*self.keys, "idx")
            .agg(F.max("rho_max").alias("rho_max"))
            .withColumn("ingest_batch_id", F.lit(BASELINE_ID))
        )
        compact_partitioned_store(self.store_path, merged, new_ct)


class StreamingHDR:
    """Grouped approximate quantiles over a stream, maintained as
    persisted mergeable HDR log-linear bucket counts
    (analytics/sketch.py hdr_*). Same store discipline as StreamingHLL
    — per-batch partial partitions (idempotent dynamic overwrite),
    crash-atomic compaction, checkpoint-lineage binding — with the
    merge law being ``sum(cnt)`` per bucket instead of register max.
    The store holds at most ``groups x 64 x 2^sub_bits`` rows per
    batch regardless of event volume."""

    def __init__(
        self,
        store_path: str,
        keys: Sequence[str],
        value_col: str,
        sub_bits: int | None = None,
    ):
        from audit_star_spark.analytics.sketch import HDR_SUB_BITS

        self.store_path = store_path
        self.keys = list(keys)
        self.value_col = value_col
        self.sub_bits = HDR_SUB_BITS if sub_bits is None else sub_bits

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from audit_star_spark.analytics.sketch import hdr_partials

        recover_store(self.store_path)
        (
            hdr_partials(batch_df, self.keys, self.value_col, self.sub_bits)
            .withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id")
            .parquet(self.store_path)
        )

    def ingest(self, stream: DataFrame, checkpoint: str, available_now: bool = True):
        verify_lineage(self.store_path, checkpoint)

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        writer = stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        bind_lineage(self.store_path, str(query.id))
        return query

    def _merged(self, spark: SparkSession) -> DataFrame:
        recover_store(self.store_path)
        rows = visible(
            spark.read.parquet(self.store_path),
            compacted_through(self.store_path),
        )
        return rows.groupBy(*self.keys, "e", "sub").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )

    def read(self, spark: SparkSession, qs: Sequence[float]) -> DataFrame:
        """(keys..., q, n, lo, hi, est) over everything ingested so far
        — identical to the batch sketch of the full history (the
        sum-merge law, test-locked)."""
        from audit_star_spark.analytics.sketch import hdr_quantiles

        return hdr_quantiles(
            self._merged(spark), self.keys, qs, self.sub_bits
        )

    def compact(self, spark: SparkSession) -> None:
        """Fold per-batch bucket partials into one baseline partition
        (crash-atomic swap; replayed folded batches pruned)."""
        recover_store(self.store_path)
        ct = compacted_through(self.store_path)
        live = visible(spark.read.parquet(self.store_path), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = (
            live.groupBy(*self.keys, "e", "sub")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .withColumn("ingest_batch_id", F.lit(BASELINE_ID))
        )
        compact_partitioned_store(self.store_path, merged, new_ct)


class StreamingCMS:
    """Grouped approximate frequencies over a stream, maintained as
    persisted mergeable Count-Min counter rows (analytics/sketch.py
    cms_*). Identical store discipline to StreamingHDR (sum-merge law);
    at most ``groups x d x w`` rows per batch regardless of volume.
    read() answers point-frequency probes; the store also feeds
    cms_join_size_estimate for pre-join cardinality checks."""

    def __init__(
        self,
        store_path: str,
        keys: Sequence[str],
        value_col: str,
        w: int | None = None,
        d: int | None = None,
    ):
        from audit_star_spark.analytics.sketch import CMS_D, CMS_W

        self.store_path = store_path
        self.keys = list(keys)
        self.value_col = value_col
        self.w = CMS_W if w is None else w
        self.d = CMS_D if d is None else d

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from audit_star_spark.analytics.sketch import cms_partials

        recover_store(self.store_path)
        (
            cms_partials(batch_df, self.keys, self.value_col, self.w, self.d)
            .withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id")
            .parquet(self.store_path)
        )

    def ingest(self, stream: DataFrame, checkpoint: str, available_now: bool = True):
        verify_lineage(self.store_path, checkpoint)

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        writer = stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        bind_lineage(self.store_path, str(query.id))
        return query

    def _merged(self, spark: SparkSession) -> DataFrame:
        recover_store(self.store_path)
        rows = visible(
            spark.read.parquet(self.store_path),
            compacted_through(self.store_path),
        )
        return rows.groupBy(*self.keys, "i", "j").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )

    def read(self, spark: SparkSession, probes: DataFrame, probe_col: str) -> DataFrame:
        """Point-frequency estimates over everything ingested so far —
        identical to the batch sketch of the full history (sum-merge
        law, test-locked)."""
        from audit_star_spark.analytics.sketch import cms_estimate

        return cms_estimate(
            self._merged(spark), probes, self.keys, probe_col, self.w, self.d
        )

    def compact(self, spark: SparkSession) -> None:
        recover_store(self.store_path)
        ct = compacted_through(self.store_path)
        live = visible(spark.read.parquet(self.store_path), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = (
            live.groupBy(*self.keys, "i", "j")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .withColumn("ingest_batch_id", F.lit(BASELINE_ID))
        )
        compact_partitioned_store(self.store_path, merged, new_ct)
