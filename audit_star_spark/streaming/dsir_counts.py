"""Incrementally maintained DSIR n-gram bucket counts: the importance-
resampling models (analytics/dsir.py — Xie et al. 2023) kept CURRENT as
target and raw corpora grow, without re-scanning history.

Like the KN store (streaming/lm_counts.py), the whole model is a
function of MERGEABLE integer counts: DSIR's target and raw bag-of-
ngrams distributions are per-bucket token counts, which merge across
batches by summing. Each micro-batch persists only its partial
(bucket, tflag, c) rows to a batch-id partition (idempotent dynamic
overwrite); read time derives the n_buckets-row log-ratio table with
add-one smoothing — identical to dsir_log_ratio_table over the full
history (the merge law, test-locked, and EXACT: integer sums and the
same ln of the same integers are bit-identical, no float caveat).
Store size is O(n_buckets x batches), compacted to O(n_buckets).

``tflag`` marks which slice a row counts toward (1 = target, 0 = raw),
decided per batch by the constructor's ``target`` predicate — the
stream analog of dsir_log_weights' target split. compact() folds
per-batch partitions into one baseline via the crash-atomic swap;
folding is the read path's groupBy-sum, so it is idempotent and
replay-safe by construction. Checkpoint-lineage binding as in every
other store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audit_star_spark.analytics.dsir import (
    DSIR_BUCKETS,
    hashed_ngram_counts,
    log_weights_from_ratio,
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


class StreamingDSIRCounts:
    """Target/raw hashed-ngram bucket counts over a document stream,
    maintained as persisted mergeable count partials."""

    def __init__(
        self,
        store_path: str,
        target: str,
        n_buckets: int = DSIR_BUCKETS,
        tokens_expr: str = TOKENS_EXPR,
    ):
        self.store_path = store_path
        self.target = target
        self.n_buckets = n_buckets
        self.tokens_expr = tokens_expr

    def _partials(self, batch_df: DataFrame) -> DataFrame:
        counts = hashed_ngram_counts(
            batch_df, self.n_buckets, self.tokens_expr
        )
        flags = batch_df.select(
            "doc_id",
            F.when(F.expr(self.target), 1).otherwise(0).alias("tflag"),
        )
        return (
            counts.join(flags, "doc_id")
            .groupBy("bucket", "tflag")
            .agg(F.sum("c").alias("c"))
        )

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
        return rows.groupBy("bucket", "tflag").agg(F.sum("c").alias("c"))

    def ratio_table(self, spark: SparkSession) -> DataFrame:
        """(bucket, lr) over everything ingested so far — identical to
        dsir_log_ratio_table of the full history (the merge law). Every
        bucket 0..n_buckets-1 is present (unseen buckets get the
        smoothed floor); n_buckets rows, broadcastable."""
        merged = self._merged(spark)
        per = merged.groupBy("bucket").agg(
            F.sum(F.when(F.col("tflag") == 1, F.col("c")).otherwise(0)).alias(
                "tc"
            ),
            F.sum(F.when(F.col("tflag") == 0, F.col("c")).otherwise(0)).alias(
                "qc"
            ),
        )
        totals = per.agg(F.sum("tc").alias("tt"), F.sum("qc").alias("qt"))
        all_buckets = spark.range(self.n_buckets).select(
            F.col("id").cast("bigint").alias("bucket")
        )
        return (
            all_buckets.join(per, "bucket", "left")
            .crossJoin(F.broadcast(totals))
            .select(
                "bucket",
                (
                    F.log(
                        (F.coalesce("tc", F.lit(0)) + F.lit(1.0))
                        / (F.col("tt") + F.lit(float(self.n_buckets)))
                    )
                    - F.log(
                        (F.coalesce("qc", F.lit(0)) + F.lit(1.0))
                        / (F.col("qt") + F.lit(float(self.n_buckets)))
                    )
                ).alias("lr"),
            )
        )

    def log_weights(
        self, docs: DataFrame, bit_exact: bool = True
    ) -> DataFrame:
        """(doc_id, log_w) for an arbitrary candidate corpus, scored
        against the CURRENT merged history's models."""
        counts = hashed_ngram_counts(docs, self.n_buckets, self.tokens_expr)
        return log_weights_from_ratio(
            counts, self.ratio_table(docs.sparkSession), bit_exact
        )

    def compact(self, spark: SparkSession) -> None:
        """Fold per-batch count partials into one baseline partition
        (crash-atomic swap; replayed folded batches pruned)."""
        recover_store(self.store_path)
        ct = compacted_through(self.store_path)
        live = visible(spark.read.parquet(self.store_path), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = (
            live.groupBy("bucket", "tflag")
            .agg(F.sum("c").alias("c"))
            .withColumn("ingest_batch_id", F.lit(BASELINE_ID))
        )
        compact_partitioned_store(self.store_path, merged, new_ct)
