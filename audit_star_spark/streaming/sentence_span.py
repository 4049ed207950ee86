"""Streaming C4 sentence-span deduplication — removal-on-ingest.

The batch operator (analytics/dedup.py sentence_span_dedup) discards
all but one of any ``span``-sentence window occurring more than once
(Raffel et al. 2020 §2.2), keeping the globally-FIRST occurrence by
(doc_id, pos). On an arriving stream "first" means first-ARRIVED: this
store keeps every span key ever seen (with its owning occurrence) and,
per micro-batch:

1. splits the batch's pages and keys its sliding spans with the SAME
   ``sentence_split`` / ``sentence_spans`` the batch operator uses
   (one code path, two execution modes);
2. an occurrence is removed iff its key exists in the standing store
   (a prior batch owns it) OR an earlier (doc_id, pos) in THIS batch
   does — batch-internal ties resolve exactly like the batch
   operator's global keep-first;
3. the per-page rewrite report (``sentence_rewrite_report``) lands in
   a batch-id results partition and the batch's first-occurrence keys
   in a batch-id store partition — both dynamic-overwrite, idempotent
   under at-least-once replay.

Replay determinism, compaction, and lineage binding follow
streaming/substring.py exactly (strictly-earlier-batch visibility +
the baseline; own-doc anti-join after compaction folds a replayed
batch's keys into the baseline).

Identity boundary (the streaming/substring.py argument applies
verbatim): span keys must be content hashes — the batch path could use
corpus-relative identities, but any corpus-relative scheme renumbers
when documents arrive. Keys here are full 128-bit md5 strings over the
literal span text (not the 60-bit prefix the token-window store
truncates to), so the birthday floor is ~W^2/2^129 — negligible at any
corpus size; a collision would remove a span that was not a duplicate
(over-removal only, never under-removal).

Scale: one (key, doc_id, pos) row per DISTINCT span in the corpus —
O(corpus sentences), the honest cost of exact span recall. Every join
keys on the span hash; the batch side is small and broadcasts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.dedup import (
    sentence_rewrite_report,
    sentence_spans,
    sentence_split,
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


class StreamingSentenceSpanDedup:
    def __init__(
        self,
        store_dir: str,
        results_dir: str,
        span: int = 3,
        text_col: str = "page",
    ):
        self.store_dir = store_dir
        self.results_dir = results_dir
        self.span = span
        self.text_col = text_col

    def _store(self, spark, before_batch: int) -> DataFrame | None:
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
        df = visible(df, compacted_through(self.store_dir))
        # strictly-earlier batches only (+ the -1 baseline): replaying
        # batch B after B+1 must not see B+1's keys
        return df.filter(
            (F.col("ingest_batch_id") < before_batch)
            | (F.col("ingest_batch_id") == BASELINE_ID)
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sents = sentence_split(
            batch_df.select("doc_id", self.text_col), self.text_col
        ).localCheckpoint(eager=False)
        spans = sentence_spans(sents, self.span).persist()

        prev = self._store(spark, batch_id)
        if prev is not None:
            # a replayed batch's own folded keys may hide inside the
            # baseline; the recomputed spans are authoritative
            prev = prev.join(
                F.broadcast(sents.select("doc_id")), "doc_id", "left_anti"
            )
        firsts_o = spans.groupBy("key").agg(
            F.min(F.struct("doc_id", "pos")).alias("o")
        )
        removed_in_batch = (
            spans.join(firsts_o, "key")
            .filter(
                (F.col("doc_id") != F.col("o.doc_id"))
                | (F.col("pos") != F.col("o.pos"))
            )
            .select("doc_id", "pos")
        )
        firsts = firsts_o.select(
            "key",
            F.col("o.doc_id").alias("doc_id"),
            F.col("o.pos").alias("pos"),
        )
        if prev is None:
            removed = removed_in_batch
            new_keys = firsts
        else:
            store_k = prev.select("key")
            hits = spans.join(store_k, "key", "left_semi").select(
                "doc_id", "pos"
            )
            removed = removed_in_batch.unionByName(hits).distinct()
            new_keys = firsts.join(store_k, "key", "left_anti")

        report = sentence_rewrite_report(sents, removed, self.span)
        (
            report.withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id")
            .parquet(self.results_dir)
        )
        (
            new_keys.withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id")
            .parquet(self.store_dir)
        )
        spans.unpersist()

    def start(
        self, pages_stream: DataFrame, checkpoint: str, available_now: bool = True
    ):
        verify_lineage(self.store_dir, checkpoint)
        writer = pages_stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        bind_lineage(self.store_dir, str(query.id))
        return query

    def results(self, spark) -> DataFrame | None:
        if not os.path.isdir(self.results_dir):
            return None
        return spark.read.parquet(self.results_dir).drop("ingest_batch_id")

    def verify_store(self, spark, pages: DataFrame) -> DataFrame:
        """Offline store-integrity pass over the INGESTED corpus
        (``pages`` must cover every page ever processed) — the
        substring store's certification, span-granular: recompute each
        page's literal spans and certify per store key that (a) no two
        DISTINCT literal spans share a key (the md5 floor did not
        fire), (b) every store key is backed by a corpus span, and (c)
        the recorded owner (doc_id, pos) actually carries it. ONE row:
        (n_store_keys, n_collisions, n_orphan_keys,
        n_owner_mismatches)."""
        recover_store(self.store_dir)
        store = visible(
            spark.read.parquet(self.store_dir),
            compacted_through(self.store_dir),
        ).select("key", "doc_id", "pos")
        sents = sentence_split(
            pages.select("doc_id", self.text_col), self.text_col
        )
        span = self.span
        lits = (
            sents.filter(F.size("sents") >= span)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        f"transform(sequence(0, size(sents) - {span}), "
                        f"i -> named_struct('pos', i, "
                        f"'w', concat_ws('\\n', slice(sents, i + 1, {span}))))"
                    )
                ).alias("x"),
            )
            .select(
                "doc_id",
                F.col("x.pos").alias("pos"),
                F.col("x.w").alias("w"),
                F.md5("x.w").alias("key"),
            )
        )
        n_keys = store.count()
        n_collisions = (
            lits.join(store.select("key"), "key", "left_semi")
            .groupBy("key")
            .agg(F.countDistinct("w").alias("nw"))
            .filter(F.col("nw") > 1)
            .count()
        )
        n_orphans = store.join(lits.select("key"), "key", "left_anti").count()
        n_owner_mismatch = store.join(
            lits.select("key", "doc_id", "pos"),
            ["key", "doc_id", "pos"],
            "left_anti",
        ).count()
        return spark.createDataFrame(
            [(n_keys, n_collisions, n_orphans, n_owner_mismatch)],
            "n_store_keys long, n_collisions long, "
            "n_orphan_keys long, n_owner_mismatches long",
        )

    def compact(self, spark) -> None:
        """Fold per-batch key partitions into the -1 baseline; a
        replayed-then-compacted edge can leave two owners — keep the
        FIRST (min (doc_id, pos)), the operator's keep-first law."""
        recover_store(self.store_dir)
        ct = compacted_through(self.store_dir)
        live = visible(spark.read.parquet(self.store_dir), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = (
            live.groupBy("key")
            .agg(F.min(F.struct("doc_id", "pos")).alias("o"))
            .select(
                "key",
                F.col("o.doc_id").alias("doc_id"),
                F.col("o.pos").alias("pos"),
            )
            .withColumn("ingest_batch_id", F.lit(BASELINE_ID))
        )
        compact_partitioned_store(self.store_dir, merged, new_ct)
