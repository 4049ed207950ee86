"""Streaming sequence-packing census — per-batch token-count partials,
chunk layout derived at read.

The batch operator (analytics/text.py packed_chunk_census) lays
documents back-to-back in doc_id order; every census column is a
function of the (doc_id, n_tokens) frame alone, so the streaming form
persists exactly that — one token-count row per arriving document
(computed with the SAME tokens_expr, one in-row size()), batch-id
partitioned with dynamic overwrite (idempotent under at-least-once
replay) — and ``census()`` re-derives the chunk layout over the merged
frame with the SAME census core
(:func:`~audit_star_spark.analytics.text.packed_chunk_census_from_lens`
— one code path, two execution modes).

READ-TIME semantics, deliberate and the honest ones: chunk boundaries
are prefix-sum-relative in doc_id order, so a document arriving with an
id BETWEEN existing ids shifts every later chunk — the census is a
function of the corpus, not of arrival order (the ccnet_disposition
argument). Freezing per-batch chunk ids would instead describe a
packing no loader would ever produce over the final corpus.

Store size: O(docs) 2-column rows, no text retained. Compaction folds
partitions into the -1 baseline unchanged (rows are per-document
facts); a batch replayed after folding is pruned by
``compacted_through`` exactly as in every other store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audit_star_spark.analytics.text import (
    TOKENS_EXPR,
    packed_chunk_census_from_lens,
)
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


class StreamingPackedChunks:
    def __init__(
        self,
        store_dir: str,
        seq_len: int = 2048,
        tokens_expr: str = TOKENS_EXPR,
    ):
        if seq_len < 1:
            raise ValueError(f"seq_len must be >= 1, got {seq_len}")
        self.store_dir = store_dir
        self.seq_len = seq_len
        self.tokens_expr = tokens_expr

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        recover_store(self.store_dir)
        lens = batch_df.select(
            "doc_id",
            F.size(F.expr(self.tokens_expr)).cast("long").alias("n_tokens"),
        )
        (
            lens.withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id")
            .parquet(self.store_dir)
        )

    def start(
        self, docs_stream: DataFrame, checkpoint: str, available_now: bool = True
    ):
        verify_lineage(self.store_dir, checkpoint)

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        writer = docs_stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        bind_lineage(self.store_dir, str(query.id))
        return query

    def _lens(self, spark: SparkSession) -> DataFrame | None:
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
        return visible(df, compacted_through(self.store_dir)).select(
            "doc_id", "n_tokens"
        )

    def census(
        self, spark: SparkSession, mode: str = "distributed"
    ) -> DataFrame | None:
        """The batch packed_chunk_census of every document ingested so
        far (parity test-locked)."""
        lens = self._lens(spark)
        if lens is None:
            return None
        return packed_chunk_census_from_lens(
            lens, seq_len=self.seq_len, mode=mode
        )

    def compact(self, spark: SparkSession) -> None:
        """Fold per-batch partitions into the -1 baseline (rows are
        per-document facts — the fold is concatenation; replayed folded
        batches pruned by ``compacted_through``)."""
        recover_store(self.store_dir)
        if not os.path.isdir(self.store_dir):
            return
        ct = compacted_through(self.store_dir)
        live = visible(spark.read.parquet(self.store_dir), ct)
        new_ct = max(ct, max_live_batch(live))
        compact_partitioned_store(
            self.store_dir,
            live.drop("ingest_batch_id").withColumn(
                "ingest_batch_id", F.lit(BASELINE_ID)
            ),
            new_ct,
        )
