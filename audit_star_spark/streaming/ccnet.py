"""Streaming CCNet disposition — the rolling-crawl shape of the batch
pipeline verdict (analytics/lm.py ccnet_disposition; Wenzek et al. 2020).

A production CCNet run never re-tokenizes its history: each micro-batch
of arriving documents folds its OWN partials into persisted mergeable
stores, and the three-stage verdict (dedup > langid > per-predicted-
language perplexity terciles) is derived AT READ over everything
ingested so far. Two stores, both batch-id-partitioned with dynamic
overwrite (idempotent under foreachBatch's at-least-once contract):

- ``registry``: one row per document — (doc_id, fingerprint,
  pred_lang). Fingerprint and langid are per-document in-row folds
  (the SAME analytics/text.py with_fingerprint / with_lang_id the
  batch pipeline uses — one code path, two execution modes), so a
  replayed batch rewrites byte-identical rows.
- ``counts``: the bigram-LM evidence, in one schema (the
  streaming/lm_counts.py single-schema trick): per-document bigram
  TYPE counts ride as (doc_id, w1, w2, c) and per-batch global unigram
  partials as (doc_id=NULL, w1, w2=NULL, c) — a real bigram row can
  never have a NULL doc_id or w2, so the families cannot collide.

Why these partials suffice: every statistic the read path needs is a
sum over the merged stores — global bigram counts C2(w1,w2) = sum of
per-doc c over docs, global unigram counts C1(w1) and |vocab| from the
unigram family, and each document's add-k bigram avg_nll =
sum(c * nll(w1,w2)) / sum(c), the occurrence-weighted mean over its
own TYPE rows (mathematically identical to the batch path's avg over
occurrence rows; float summation order may differ in the last ulp,
absorbed by the 6-dp ppl rounding the cut already mandates for
cross-engine stability).

READ-TIME semantics, deliberately: ``disposition()`` equals the BATCH
``ccnet_disposition`` run over the union of everything ingested (the
parity law, test-locked) — which means a document's verdict can CHANGE
as the corpus grows (its language's perplexity terciles shift; a later
duplicate does NOT flip the earlier keeper because keep-first is
min(doc_id), recomputed globally at read). That is the CCNet contract:
bins are corpus-relative, so the verdict is a function of the corpus,
not of arrival order — exactly why the stages fold partials instead of
freezing per-batch verdicts.

Replay determinism, compaction, and lineage binding follow
streaming/lm_counts.py exactly: dynamic batch-partition overwrite,
strictly-monotone visibility via ``compacted_through`` (a batch
replayed after being folded into the baseline is pruned, never double-
counted), crash-atomic baseline swaps.

Store size: O(distinct (doc, bigram-type)) + O(docs) — the honest cost
of exact self-trained perplexity (the lm_counts argument); no raw text
is retained.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audit_star_spark.analytics.lm import (
    _bigrams,
    ccnet_verdict_expr,
    ntile_cut,
)
from audit_star_spark.analytics.text import (
    TOKENS_EXPR,
    with_fingerprint,
    with_lang_id,
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

_COUNT_SCHEMA = "doc_id bigint, w1 string, w2 string, c bigint"


class StreamingCCNet:
    """CCNet disposition over a document stream: per-batch partial
    folds into two mergeable stores; the verdict is derived at read and
    equals the batch pipeline over everything ingested (test-locked)."""

    def __init__(
        self,
        store_root: str,
        n_bins: int = 3,
        add_k: float = 0.5,
        tokens_expr: str = TOKENS_EXPR,
    ):
        if add_k <= 0:
            raise ValueError(f"add_k must be positive, got {add_k}")
        self.registry_dir = os.path.join(store_root, "registry")
        self.counts_dir = os.path.join(store_root, "counts")
        self.n_bins = n_bins
        self.add_k = add_k
        self.tokens_expr = tokens_expr

    # -- ingest ----------------------------------------------------------
    def _partial_counts(self, batch_df: DataFrame) -> DataFrame:
        bg = (
            _bigrams(batch_df, self.tokens_expr)
            .groupBy("doc_id", "w1", "w2")
            .agg(F.count("*").alias("c"))
        )
        uni = (
            batch_df.select(F.explode(F.expr(self.tokens_expr)).alias("w1"))
            .groupBy("w1")
            .agg(F.count("*").alias("c"))
            .select(
                F.lit(None).cast("bigint").alias("doc_id"),
                "w1",
                F.lit(None).cast("string").alias("w2"),
                "c",
            )
        )
        return bg.select("doc_id", "w1", "w2", "c").unionByName(uni)

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        recover_store(self.registry_dir)
        recover_store(self.counts_dir)
        if "lang" not in batch_df.columns:
            # with_lang_id carries the trusted label through for its
            # census callers; a crawl stream has none — pad it (the
            # disposition only ever uses pred_lang)
            batch_df = batch_df.withColumn(
                "lang", F.lit(None).cast("string")
            )
        registry = (
            with_fingerprint(batch_df)
            .join(with_lang_id(batch_df).select("doc_id", "pred_lang"), "doc_id")
            .select("doc_id", "fingerprint", "pred_lang")
        )
        for df, path in (
            (registry, self.registry_dir),
            (self._partial_counts(batch_df), self.counts_dir),
        ):
            (
                df.withColumn("ingest_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch_id")
                .parquet(path)
            )

    def start(
        self, docs_stream: DataFrame, checkpoint: str, available_now: bool = True
    ):
        verify_lineage(self.registry_dir, checkpoint)

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        writer = docs_stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        bind_lineage(self.registry_dir, str(query.id))
        return query

    # -- read ------------------------------------------------------------
    def _visible(self, spark: SparkSession, path: str) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        recover_store(path)
        if not os.path.isdir(path):
            return None
        try:
            df = spark.read.parquet(path)
        except AnalysisException as ex:
            cls = getattr(ex, "getErrorClass", lambda: None)() or ""
            if "PATH_NOT_FOUND" in cls or "UNABLE_TO_INFER_SCHEMA" in cls:
                return None
            raise
        return visible(df, compacted_through(path))

    def disposition(
        self, spark: SparkSession, mode: str = "distributed"
    ) -> DataFrame | None:
        """(doc_id, pred_lang, is_dup, ppl6, bin, disposition) for every
        document ingested so far — the batch ``ccnet_disposition`` of
        the union corpus (parity test-locked). ``mode`` switches the
        ntile cut exactly as in the batch operator; 'distributed' (the
        default here — a crawl store is the 100 TB case) never builds a
        corpus-sized window partition."""
        reg = self._visible(spark, self.registry_dir)
        if reg is None:
            return None
        reg = reg.select("doc_id", "fingerprint", "pred_lang")
        counts = self._visible(spark, self.counts_dir)
        if counts is None:
            # crash window between the two sink writes: registry exists,
            # counts not yet — every doc reads as unscorable until the
            # replayed batch lands both
            counts = spark.createDataFrame([], _COUNT_SCHEMA)
        counts = counts.groupBy("doc_id", "w1", "w2").agg(
            F.sum("c").alias("c")
        )
        big = counts.filter(F.col("doc_id").isNotNull())
        uni = counts.filter(F.col("doc_id").isNull()).select(
            "w1", F.col("c").alias("c1")
        )
        vocab = uni.agg(F.count("*").alias("v"))
        c2 = big.groupBy("w1", "w2").agg(F.sum("c").alias("c2"))
        k = self.add_k
        nll = -F.log(
            (F.coalesce(F.col("c2"), F.lit(0)) + k)
            / (F.coalesce(F.col("c1"), F.lit(0)) + k * F.col("v"))
        )
        scores = (
            big.join(c2, ["w1", "w2"], "left")
            .join(uni, "w1", "left")
            .crossJoin(F.broadcast(vocab))
            .withColumn("nll", nll)
            .groupBy("doc_id")
            .agg(
                (F.sum(F.col("c") * F.col("nll")) / F.sum("c")).alias("avg_nll")
            )
        )
        scored = (
            reg.join(scores, "doc_id")
            .filter(F.col("avg_nll").isNotNull())
            .select(
                "doc_id",
                F.col("pred_lang").alias("lang"),
                F.round(F.exp("avg_nll"), 6).alias("ppl6"),
            )
        )
        binned = ntile_cut(scored, n_bins=self.n_bins, mode=mode).select(
            "doc_id", "ppl6", "bin"
        )
        first = reg.groupBy("fingerprint").agg(F.min("doc_id").alias("__keep"))
        dup = reg.join(first, "fingerprint").select(
            "doc_id",
            "pred_lang",
            (F.col("doc_id") != F.col("__keep")).alias("is_dup"),
        )
        return dup.join(binned, "doc_id", "left").select(
            "doc_id",
            "pred_lang",
            "is_dup",
            "ppl6",
            F.col("bin").cast("int").alias("bin"),
            ccnet_verdict_expr(self.n_bins).alias("disposition"),
        )

    # -- maintenance -----------------------------------------------------
    def compact(self, spark: SparkSession) -> None:
        """Fold per-batch partitions of both stores into their -1
        baselines (crash-atomic swap; replayed folded batches pruned by
        ``compacted_through``). Counts merge by groupBy-sum — the same
        aggregation the read path runs, so compaction is idempotent and
        invisible to ``disposition()`` by construction; registry rows
        are per-document facts and concatenate unchanged."""
        for path, fold in (
            (self.registry_dir, None),
            (self.counts_dir, ("doc_id", "w1", "w2")),
        ):
            recover_store(path)
            if not os.path.isdir(path):
                continue
            ct = compacted_through(path)
            live = visible(spark.read.parquet(path), ct)
            new_ct = max(ct, max_live_batch(live))
            merged = (
                live.groupBy(*fold).agg(F.sum("c").alias("c"))
                if fold
                else live.drop("ingest_batch_id")
            )
            compact_partitioned_store(
                path,
                merged.withColumn("ingest_batch_id", F.lit(BASELINE_ID)),
                new_ct,
            )
