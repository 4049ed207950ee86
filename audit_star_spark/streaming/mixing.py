"""Streaming data-mixing state — mergeable per-source TOKEN-COUNT
partials over an arriving document stream.

UniMax allocation (and any budget/mixing policy) is CORPUS-RELATIVE: a
source's epoch cap depends on its TOTAL token count, so per-batch
verdicts would freeze the allocation mid-crawl and diverge from the
batch semantics the moment a source keeps growing. The mergeable state
is the per-source token count: each micro-batch folds its documents
into those counts (one map-side-combined aggregate) and persists them
to a batch-id partition (dynamic overwrite — idempotent under
at-least-once replay); ``unimax()`` merges the partials and runs the
SAME closed form as the batch operator (analytics/text.py
unimax_from_counts — one code path), so the result equals the batch
allocation of everything ingested (parity is hash-exact: integer count
state, shared tail).

Store size: O(sources) rows per trigger — never the input rows.
Compaction folds partials into the -1 baseline with the identical
merge the read path runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audit_star_spark.analytics.text import TOKENS_EXPR, unimax_from_counts
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


class StreamingTokenCounts:
    def __init__(self, store_dir: str, tokens_expr: str = TOKENS_EXPR):
        self.store_dir = store_dir
        self.tokens_expr = tokens_expr

    def _partials(self, batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.select(
                "source",
                F.size(F.expr(self.tokens_expr)).cast("long").alias("t"),
            )
            .groupBy("source")
            .agg(F.sum("t").alias("n"))
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
        self, doc_stream: DataFrame, checkpoint: str, available_now: bool = True
    ):
        verify_lineage(self.store_dir, checkpoint)

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        writer = doc_stream.writeStream.foreachBatch(on_batch).option(
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
        return live.groupBy("source").agg(F.sum("n").alias("n_tokens"))

    def unimax(
        self, spark: SparkSession, budget_tokens: int, max_epochs: float = 1.0
    ) -> DataFrame | None:
        """The batch :func:`unimax_budget` of everything ingested so far
        (parity test-locked)."""
        merged = self._merged(spark)
        if merged is None:
            return None
        return unimax_from_counts(merged, budget_tokens, max_epochs)

    def compact(self, spark: SparkSession) -> None:
        """Fold per-batch partials into the -1 baseline — the same
        groupBy merge the read path runs, so compaction is idempotent
        and invisible to reads by construction."""
        recover_store(self.store_dir)
        if not os.path.isdir(self.store_dir):
            return
        ct = compacted_through(self.store_dir)
        live = visible(spark.read.parquet(self.store_dir), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = live.groupBy("source").agg(F.sum("n").alias("n"))
        compact_partitioned_store(
            self.store_dir,
            merged.withColumn("ingest_batch_id", F.lit(BASELINE_ID)),
            new_ct,
        )
