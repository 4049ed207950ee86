"""Incrementally maintained Kneser-Ney trigram counts: a language-model
quality filter that stays CURRENT as the trusted corpus grows, without
ever re-scanning history.

The insight that makes this a plain mergeable store (no custom stateful
operator): every interpolated-KN statistic — trigram context sums,
continuation (type) counts, the N1+ totals, the vocabulary size — is a
function of the merged trigram TYPE table (w1, w2, w3, sum c3) and the
merged unigram table (w, sum c). Both merge across batches by summing
counts, so each micro-batch persists only its partial counts to a
batch-id partition (idempotent dynamic overwrite — the
EventRollup/StreamingHLL pattern) and read time derives the model with
analytics/lm.py kn_tables_from_counts. Store size is O(distinct
trigram types), the honest cost of exact counts (the same argument as
the exact-substring store).

One store, one schema: unigram rows ride in the trigram schema with
w2 = w3 = NULL (a real trigram can never have NULL members — tokens
come from a split). compact() folds per-batch partitions into one
baseline via the crash-atomic swap; folding is the same groupBy-sum
the read path runs, so it is idempotent and replay-safe by
construction. Checkpoint-lineage binding as in every other store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audit_star_spark.analytics.lm import (
    _trigrams,
    kn_tables_from_counts,
    release_kn_model,
)
from audit_star_spark.analytics.text import TOKENS_EXPR
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


class StreamingKNCounts:
    """Kneser-Ney trigram + unigram counts over a document stream,
    maintained as persisted mergeable count partials."""

    def __init__(self, store_path: str, tokens_expr: str = TOKENS_EXPR):
        self.store_path = store_path
        self.tokens_expr = tokens_expr
        self._last_model: dict[str, DataFrame] | None = None

    def _partials(self, batch_df: DataFrame) -> DataFrame:
        tri = (
            _trigrams(batch_df, self.tokens_expr)
            .groupBy("w1", "w2", "w3")
            .agg(F.count("*").alias("c"))
        )
        uni = (
            batch_df.select(
                F.explode(F.expr(self.tokens_expr)).alias("w1")
            )
            .groupBy("w1")
            .agg(F.count("*").alias("c"))
            .select(
                "w1",
                F.lit(None).cast("string").alias("w2"),
                F.lit(None).cast("string").alias("w3"),
                "c",
            )
        )
        return tri.unionByName(uni)

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        recover_store(self.store_path)
        (
            self._partials(batch_df)
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
        return rows.groupBy("w1", "w2", "w3").agg(F.sum("c").alias("c"))

    def model(self, spark: SparkSession) -> dict[str, DataFrame]:
        """The KN model dict over everything ingested so far —
        identical to train_kn_trigram_lm of the full history (the merge
        law, test-locked). Feed to analytics/lm.py score_kn.

        Each call releases the PREVIOUS hand-out's persisted type table
        (kn_tables_from_counts' lifetime contract) — calling model()
        per read would otherwise pin one persisted dataset per call for
        the session's life. Finish scoring against a model before
        requesting the next one, or persist your own copy."""
        if self._last_model is not None:
            release_kn_model(self._last_model)
        merged = self._merged(spark)
        tri = merged.filter(F.col("w2").isNotNull()).select(
            "w1", "w2", "w3", F.col("c").alias("c3")
        )
        vocab = merged.filter(F.col("w2").isNull()).select(
            F.col("w1").alias("w"), "c"
        )
        self._last_model = kn_tables_from_counts(tri, vocab)
        return self._last_model

    def compact(self, spark: SparkSession) -> None:
        """Fold per-batch count partials into one baseline partition
        (crash-atomic swap; replayed folded batches pruned)."""
        recover_store(self.store_path)
        ct = compacted_through(self.store_path)
        live = visible(spark.read.parquet(self.store_path), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = (
            live.groupBy("w1", "w2", "w3")
            .agg(F.sum("c").alias("c"))
            .withColumn("ingest_batch_id", F.lit(BASELINE_ID))
        )
        compact_partitioned_store(self.store_path, merged, new_ct)
