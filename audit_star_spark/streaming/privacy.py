"""Streaming k-anonymity census — mergeable per-(quasi, sensitive)
count partials over an arriving row stream.

Equivalence-class sizes and l-diversity are CORPUS-RELATIVE (a class
split across batches must count as one class; a sensitive value seen in
two batches is one distinct value), so per-batch census rows would
diverge the moment a class straddles a trigger. The mergeable state is
the per-(quasi-tuple, sensitive-value) COUNT: each micro-batch folds its
rows into those counts (one map-side-combined aggregate) and persists
them to a batch-id partition (dynamic overwrite — idempotent under
at-least-once replay); ``census()`` merges the partials, derives
class_size = sum of counts and l = number of live sensitive values per
class, and runs the SAME size-census tail as the batch operator
(analytics/privacy.py census_from_classes — one code path), so the
result equals the batch census of everything ingested (parity
test-locked).

Store size: O(distinct quasi x sensitive combinations) rows per trigger
— never the input rows. Compaction folds partials into the -1 baseline
with the identical merge the read path runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audit_star_spark.analytics.privacy import census_from_classes
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


class StreamingKAnonymity:
    def __init__(
        self,
        store_dir: str,
        quasi_cols: list[str],
        k: int = 5,
        sensitive_col: str | None = None,
    ):
        if not quasi_cols:
            raise ValueError("quasi_cols must name at least one column")
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.store_dir = store_dir
        self.quasi_cols = list(quasi_cols)
        self.k = k
        self.sensitive_col = sensitive_col

    def _keys(self) -> list[str]:
        keys = list(self.quasi_cols)
        if self.sensitive_col is not None:
            keys.append(self.sensitive_col)
        return keys

    def _partials(self, batch_df: DataFrame) -> DataFrame:
        return batch_df.groupBy(*self._keys()).agg(F.count("*").alias("n"))

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
        self, row_stream: DataFrame, checkpoint: str, available_now: bool = True
    ):
        verify_lineage(self.store_dir, checkpoint)

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        writer = row_stream.writeStream.foreachBatch(on_batch).option(
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
        return live.groupBy(*self._keys()).agg(F.sum("n").alias("n"))

    def census(self, spark: SparkSession) -> DataFrame | None:
        """The batch k_anonymity_census of everything ingested so far
        (parity test-locked)."""
        merged = self._merged(spark)
        if merged is None:
            return None
        aggs = [F.sum("n").alias("class_size")]
        if self.sensitive_col is not None:
            # every stored (quasi, sensitive) row has n >= 1, so the
            # live row count IS the distinct-sensitive count
            aggs.append(F.count("*").alias("l"))
        classes = merged.groupBy(*self.quasi_cols).agg(*aggs)
        return census_from_classes(
            classes, self.k, self.sensitive_col is not None
        )

    def t_closeness(self, spark: SparkSession, t: float = 0.2) -> DataFrame | None:
        """The batch :func:`t_closeness_census` of everything ingested so
        far. The store's per-(quasi, sensitive) count partials ARE the
        state that audit needs, so the read merges them and runs the
        SAME tail as the batch operator
        (analytics/privacy.py t_closeness_from_counts — one code path;
        integer count state, so parity with batch is hash-exact)."""
        from audit_star_spark.analytics.privacy import t_closeness_from_counts

        if self.sensitive_col is None:
            raise ValueError(
                "t_closeness requires the store to track a sensitive_col"
            )
        merged = self._merged(spark)
        if merged is None:
            return None
        return t_closeness_from_counts(
            merged, self.quasi_cols, self.sensitive_col, t
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
        merged = live.groupBy(*self._keys()).agg(F.sum("n").alias("n"))
        compact_partitioned_store(
            self.store_dir,
            merged.withColumn("ingest_batch_id", F.lit(BASELINE_ID)),
            new_ct,
        )
