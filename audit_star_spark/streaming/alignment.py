"""Streaming CLIP-alignment census — mergeable per-label partials over
an arriving (image, caption) pair stream.

The batch operator (analytics/similarity.py clip_alignment_census) is a
pure census: every output column is a sum/count/min/max over per-pair
similarities, so the streaming form is the plain mergeable-store shape
(the EventRollup / lm_counts pattern): each micro-batch folds ITS pairs
into one partial row per label (similarity computed with the SAME
in-row folds — one code path, two execution modes) and persists it to a
batch-id partition (dynamic overwrite — idempotent under at-least-once
replay); ``census()`` merges the partials and derives the ratio columns,
equal to the batch census of everything ingested (parity test-locked;
the float mean re-associates across batch partials, absorbed by the
same 6-dp rounding the batch contract already mandates).

Store size: O(labels) rows per trigger — the census never retains
pairs, embeddings, or similarities. Compaction folds partials into the
-1 baseline with the identical merge the read path runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audit_star_spark.analytics.similarity import _dot
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

_MERGE_KEYS = ("label",)


class StreamingClipAlignment:
    def __init__(
        self,
        store_dir: str,
        img_col: str = "img_vec",
        txt_col: str = "txt_vec",
        threshold: float = 0.28,
        label_col: str = "label",
    ):
        self.store_dir = store_dir
        self.img_col = img_col
        self.txt_col = txt_col
        self.threshold = threshold
        self.label_col = label_col

    def _partials(self, batch_df: DataFrame) -> DataFrame:
        dot = _dot(self.img_col, self.txt_col)
        ni = F.sqrt(_dot(self.img_col, self.img_col))
        nt = F.sqrt(_dot(self.txt_col, self.txt_col))
        sim = F.when((ni > 0) & (nt > 0), dot / (ni * nt))
        scored = batch_df.select(
            F.col(self.label_col).alias("label"), sim.alias("sim")
        )
        return scored.groupBy("label").agg(
            F.count("*").alias("n_pairs"),
            F.count("sim").alias("n_scored"),
            F.sum(
                F.when(F.col("sim") >= self.threshold, 1).otherwise(0)
            ).alias("n_aligned"),
            F.sum("sim").alias("sum_sim"),
            F.min("sim").alias("min_sim"),
            F.max("sim").alias("max_sim"),
        )

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        recover_store(self.store_dir)
        (
            self._partials(batch_df)
            .withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id")
            .parquet(self.store_dir)
        )

    def start(
        self, pairs_stream: DataFrame, checkpoint: str, available_now: bool = True
    ):
        verify_lineage(self.store_dir, checkpoint)

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        writer = pairs_stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        bind_lineage(self.store_dir, str(query.id))
        return query

    def _merged(self, spark: SparkSession) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        recover_store(self.store_dir)
        if not os.path.isdir(self.store_dir):
            return None
        try:
            df = spark.read.parquet(self.store_dir)
        except AnalysisException as ex:
            cls = getattr(ex, "getErrorClass", lambda: None)() or ""
            if "PATH_NOT_FOUND" in cls or "UNABLE_TO_INFER_SCHEMA" in cls:
                return None
            raise
        live = visible(df, compacted_through(self.store_dir))
        return live.groupBy(*_MERGE_KEYS).agg(
            F.sum("n_pairs").alias("n_pairs"),
            F.sum("n_scored").alias("n_scored"),
            F.sum("n_aligned").alias("n_aligned"),
            F.sum("sum_sim").alias("sum_sim"),
            F.min("min_sim").alias("min_sim"),
            F.max("max_sim").alias("max_sim"),
        )

    def census(self, spark: SparkSession) -> DataFrame | None:
        """The batch clip_alignment_census of everything ingested so
        far (parity test-locked): one row per label with the derived
        ratio columns."""
        merged = self._merged(spark)
        if merged is None:
            return None
        return merged.select(
            "label",
            "n_pairs",
            "n_scored",
            "n_aligned",
            F.round(
                F.col("n_aligned") / F.nullif(F.col("n_scored"), F.lit(0)), 6
            ).alias("frac_aligned6"),
            F.round(
                F.col("sum_sim") / F.nullif(F.col("n_scored"), F.lit(0)), 6
            ).alias("avg_sim6"),
            F.round("min_sim", 6).alias("min_sim6"),
            F.round("max_sim", 6).alias("max_sim6"),
        )

    def compact(self, spark: SparkSession) -> None:
        """Fold per-batch partials into the -1 baseline — the same
        groupBy merge ``census()`` runs, so compaction is idempotent
        and invisible to reads by construction."""
        recover_store(self.store_dir)
        if not os.path.isdir(self.store_dir):
            return
        ct = compacted_through(self.store_dir)
        live = visible(spark.read.parquet(self.store_dir), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = live.groupBy(*_MERGE_KEYS).agg(
            F.sum("n_pairs").alias("n_pairs"),
            F.sum("n_scored").alias("n_scored"),
            F.sum("n_aligned").alias("n_aligned"),
            F.sum("sum_sim").alias("sum_sim"),
            F.min("min_sim").alias("min_sim"),
            F.max("max_sim").alias("max_sim"),
        )
        compact_partitioned_store(
            self.store_dir,
            merged.withColumn("ingest_batch_id", F.lit(BASELINE_ID)),
            new_ct,
        )
