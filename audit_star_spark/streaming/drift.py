"""Streaming embedding-drift monitor — per-(side, dimension) moment
partials over an arriving vector stream.

The batch census (analytics/drift.py embedding_drift) compares a
reference and a candidate corpus; the streaming deployment is the same
comparison against a ROLLING candidate (new snapshot shards arriving)
— per-dimension means/variances are corpus-relative, so the mergeable
state is the sufficient statistics: per (side, dim), (n, sum x,
sum x^2). Each micro-batch folds its vectors into those moments (one
map-side-combined aggregate, O(2 x D) rows per trigger) and persists
them to a batch-id partition (dynamic overwrite — idempotent under
at-least-once replay); ``census()`` merges the moments and derives the
drift columns with the ONE-PASS variance identity var = E[x^2] -
mean^2.

One-pass vs the batch operator's two-pass centering: algebraically
identical, floating-point different in the last ulps — moments are the
only state a stream can merge (re-centering would need the final mean
before any batch is folded), so the parity lock against the batch
census is a 1e-5 TOLERANCE lock (the same contract as the batch
operator's own bit_exact=False production mode), not a hash lock. The
derived-column arithmetic (smd, Fréchet term, rounding) is shared with
nothing — it is restated here from the same formulas, locked by that
parity test.
"""

from __future__ import annotations

import os

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

_MERGE_KEYS = ("side", "i")


class StreamingEmbeddingDrift:
    def __init__(self, store_dir: str, side=None):
        self.store_dir = store_dir
        self.side = side

    def _partials(self, batch_df: DataFrame) -> DataFrame:
        from audit_star_spark.analytics.similarity import VEC_EXPR

        side = self.side if self.side is not None else F.col("label") % 2
        ex = batch_df.withColumn("side", side).select(
            "side", F.posexplode(F.expr(VEC_EXPR)).alias("i", "x")
        )
        return ex.groupBy("side", "i").agg(
            F.count("*").alias("n"),
            F.sum("x").alias("s1"),
            F.sum(F.col("x") * F.col("x")).alias("s2"),
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
        self, vec_stream: DataFrame, checkpoint: str, available_now: bool = True
    ):
        verify_lineage(self.store_dir, checkpoint)

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        writer = vec_stream.writeStream.foreachBatch(on_batch).option(
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
            F.sum("n").alias("n"),
            F.sum("s1").alias("s1"),
            F.sum("s2").alias("s2"),
        )

    def census(self, spark: SparkSession) -> DataFrame | None:
        """The drift census of everything ingested so far — same schema
        as batch embedding_drift, tolerance-parity-locked against it."""
        merged = self._merged(spark)
        if merged is None:
            return None
        st = merged.select(
            "side",
            "i",
            "n",
            (F.col("s1") / F.col("n").cast("double")).alias("m"),
            # clamp at 0: cancellation can leave E[x^2] - mean^2 a few
            # ulps NEGATIVE on a constant dimension, and sqrt(va*vb)
            # would then be NaN
            F.greatest(
                F.col("s2") / F.col("n").cast("double")
                - (F.col("s1") / F.col("n").cast("double"))
                * (F.col("s1") / F.col("n").cast("double")),
                F.lit(0.0),
            ).alias("var"),
        )
        a = st.filter(F.col("side") == 0).select(
            "i",
            F.col("n").alias("n_a"),
            F.col("m").alias("ma"),
            F.col("var").alias("va"),
        )
        b = st.filter(F.col("side") == 1).select(
            "i",
            F.col("n").alias("n_b"),
            F.col("m").alias("mb"),
            F.col("var").alias("vb"),
        )
        pooled = (F.col("va") + F.col("vb")) / F.lit(2.0)
        smd = F.when(
            F.col("va") + F.col("vb") > 0,
            (F.col("ma") - F.col("mb")) / F.sqrt(pooled),
        )
        fid = (
            (F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))
            + F.col("va")
            + F.col("vb")
            - F.lit(2.0) * F.sqrt(F.col("va") * F.col("vb"))
        )
        return a.join(b, "i").select(
            F.col("i").cast("long").alias("i"),
            "n_a",
            "n_b",
            F.round("ma", 6).alias("mean_a6"),
            F.round("mb", 6).alias("mean_b6"),
            F.round("va", 6).alias("var_a6"),
            F.round("vb", 6).alias("var_b6"),
            F.round(smd, 6).alias("smd6"),
            F.round(fid, 6).alias("fid_term6"),
        )

    def compact(self, spark: SparkSession) -> None:
        """Fold per-batch moment partials into the -1 baseline — the
        same groupBy merge ``census()`` runs."""
        recover_store(self.store_dir)
        if not os.path.isdir(self.store_dir):
            return
        ct = compacted_through(self.store_dir)
        live = visible(spark.read.parquet(self.store_dir), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = live.groupBy(*_MERGE_KEYS).agg(
            F.sum("n").alias("n"),
            F.sum("s1").alias("s1"),
            F.sum("s2").alias("s2"),
        )
        compact_partitioned_store(
            self.store_dir,
            merged.withColumn("ingest_batch_id", F.lit(BASELINE_ID)),
            new_ct,
        )


class StreamingVocabDrift:
    """Streaming vocabulary drift — per-(side, token) count partials.

    Counts are integers, so merged partials reproduce the batch
    vocab_drift output EXACTLY (hash parity, not tolerance — unlike the
    moment-based embedding monitor above): each micro-batch folds its
    tokens into (side, token, c) rows and ``census()`` runs the shared
    ranking tail (analytics/drift.py vocab_drift_from_counts — one code
    path) over the merged counts. Store size is O(distinct tokens seen
    per trigger)."""

    def __init__(self, store_dir: str, k: int = 100, side=None):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.store_dir = store_dir
        self.k = k
        self.side = side

    def _partials(self, batch_df: DataFrame) -> DataFrame:
        from audit_star_spark.analytics.text import TOKENS_EXPR

        side = self.side if self.side is not None else F.col("doc_id") % 2
        toks = (
            batch_df.withColumn("side", side)
            .select("side", F.explode(F.expr(TOKENS_EXPR)).alias("token"))
            .filter(F.length("token") > 0)
        )
        return toks.groupBy("side", "token").agg(F.count("*").alias("c"))

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
        return live.groupBy("side", "token").agg(F.sum("c").alias("c"))

    def census(self, spark: SparkSession) -> DataFrame | None:
        """The batch vocab_drift of everything ingested so far (EXACT
        parity test-locked)."""
        from audit_star_spark.analytics.drift import vocab_drift_from_counts

        merged = self._merged(spark)
        if merged is None:
            return None
        return vocab_drift_from_counts(merged, self.k)

    def compact(self, spark: SparkSession) -> None:
        recover_store(self.store_dir)
        if not os.path.isdir(self.store_dir):
            return
        ct = compacted_through(self.store_dir)
        live = visible(spark.read.parquet(self.store_dir), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = live.groupBy("side", "token").agg(F.sum("c").alias("c"))
        compact_partitioned_store(
            self.store_dir,
            merged.withColumn("ingest_batch_id", F.lit(BASELINE_ID)),
            new_ct,
        )
