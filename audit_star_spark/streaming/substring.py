"""Streaming exact-substring deduplication — removal-on-ingest.

The batch operator (analytics/dedup.py substring_dedup_rewrite) removes
every duplicated >= k-token run, keeping the globally-FIRST occurrence
by (doc_id, pos). On an arriving stream "first" means first-ARRIVED:
this store keeps every window hash ever seen (with its owning
occurrence) and, per micro-batch:

1. hashes the batch's overlapping k-token windows with the SAME
   ``substring_windows`` the batch operator uses (one hashing code
   path, two execution modes);
2. an occurrence is removed iff its hash exists in the standing store
   (a prior batch owns it) OR an earlier (doc_id, pos) in THIS batch
   does — so doc order inside a batch ties off exactly like the batch
   operator's global rank;
3. the batch's per-doc rewrite report (span merge + cleaned text md5,
   ``substring_rewrite_report``) lands in a batch-id results partition,
   and the batch's FIRST-occurrence hashes land in a batch-id store
   partition — both with dynamic overwrite, idempotent under
   at-least-once replay.

Replay determinism is STRICTER than the near-dup store's: a batch
consults only store partitions with ``ingest_batch_id < batch_id``
(plus the compaction baseline), so replaying batch B after B+1 already
ran re-produces B's partitions byte-identically instead of seeing B+1's
hashes. After compaction a replayed batch's own folded hashes hide in
the baseline; the batch's freshly computed windows are authoritative,
so the store side drops rows owned by the batch's own doc_ids
(broadcast anti-join, the near-dup store's rule).

Batch ≡ stream parity (test-locked): when batches partition the corpus
in ascending doc_id ranges, arrival order coincides with (doc_id, pos)
order and the streamed reports equal ``substring_dedup_rewrite`` on the
full corpus row for row.

Scale: the store holds one (h, doc_id, pos) row per DISTINCT window in
the corpus — O(corpus tokens), the honest cost of exact-substring
recall (the offline equivalent is a suffix array over the corpus, same
order); contrast the near-dup store's bounded sketches, which buy their
O(docs x k) bound with approximate Jaccard. Every join here keys on the
window hash; the batch side is small and broadcasts.

Why the stream CANNOT use suffix-rank window identity (the batch
path's collision-free alternative, analytics/suffix.py
suffix_window_keys): a rank pair is CORPUS-RELATIVE — rank_h is the
dense rank of a suffix among ALL suffixes seen, so every arriving
document inserts new suffixes and renumbers ranks globally. A store
keyed on batch-B rank pairs is meaningless at batch B+1; keeping the
pairs current would mean re-running the doubling ladder over the whole
accumulated corpus each micro-batch, which IS the batch operator, not
an incremental store. Content hashes are the only window identity
that is stable under insertion, so the stream keeps md5 — and accepts
its collision floor:

    h = first 15 hex chars of md5 = 60 bits. By the birthday bound a
    store of W distinct windows expects ~ W^2 / 2^61 colliding pairs:
    ~4e-4 at W = 1e9 windows, ~0.4 at W = 1e11. A collision removes an
    occurrence that was NOT actually a duplicate (silent
    over-removal); it can never under-remove. The batch suffix-rank
    path has floor 0 — run it offline when exactness matters, or run
    ``verify_store`` (below) against the ingested corpus to certify
    after the fact that no collision actually occurred.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.dedup import (
    substring_rewrite_report,
    substring_windows,
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


class StreamingSubstringDedup:
    def __init__(self, store_dir: str, results_dir: str, k: int = 8):
        self.store_dir = store_dir
        self.results_dir = results_dir
        self.k = k

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
        # batch B after B+1 must not see B+1's hashes
        return df.filter(
            (F.col("ingest_batch_id") < before_batch)
            | (F.col("ingest_batch_id") == BASELINE_ID)
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = batch_df.select(
            "doc_id", F.expr(TOKENS_EXPR).alias("toks")
        ).localCheckpoint(eager=False)
        wins = substring_windows(base, self.k).persist()

        prev = self._store(spark, batch_id)
        if prev is not None:
            # a replayed batch's own folded hashes may hide inside the
            # baseline; the recomputed windows are authoritative
            prev = prev.join(
                F.broadcast(base.select("doc_id")), "doc_id", "left_anti"
            )
        # groupBy-min + join, same skew-robust shape as the batch
        # operator (substring_removed_occurrences)
        firsts_o = wins.groupBy("h").agg(
            F.min(F.struct("doc_id", "pos")).alias("o")
        )
        removed_in_batch = (
            wins.join(firsts_o, "h")
            .filter(
                (F.col("doc_id") != F.col("o.doc_id"))
                | (F.col("pos") != F.col("o.pos"))
            )
            .select("doc_id", "pos")
        )
        firsts = firsts_o.select(
            "h",
            F.col("o.doc_id").alias("doc_id"),
            F.col("o.pos").alias("pos"),
        )
        if prev is None:
            removed = removed_in_batch
            new_hashes = firsts
        else:
            store_h = prev.select("h")
            hits = wins.join(store_h, "h", "left_semi").select("doc_id", "pos")
            removed = removed_in_batch.unionByName(hits).distinct()
            new_hashes = firsts.join(store_h, "h", "left_anti")

        report = substring_rewrite_report(base, removed, self.k)
        (
            report.withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id")
            .parquet(self.results_dir)
        )
        (
            new_hashes.withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id")
            .parquet(self.store_dir)
        )
        wins.unpersist()

    def start(
        self, docs_stream: DataFrame, checkpoint: str, available_now: bool = True
    ):
        verify_lineage(self.store_dir, checkpoint)
        writer = docs_stream.writeStream.foreachBatch(self.process_batch).option(
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

    def verify_store(self, spark, docs: DataFrame) -> DataFrame:
        """Offline store-integrity pass over the INGESTED corpus
        (``docs`` must cover every document ever processed): recompute
        each document's literal k-token windows and certify, per store
        hash, that (a) no two DISTINCT literal windows share a hash
        (the md5 collision floor did not fire — every removal was a
        true duplicate), (b) every store hash is backed by at least
        one corpus window (no orphans from a corpus/store mismatch),
        and (c) the recorded owner (doc_id, pos) actually carries that
        window. ONE row: (n_store_hashes, n_collisions,
        n_orphan_hashes, n_owner_mismatches) — all-zero tail means the
        stream's output is bit-identical to what the collision-free
        batch path would have produced on the same arrival order."""
        recover_store(self.store_dir)
        store = visible(
            spark.read.parquet(self.store_dir),
            compacted_through(self.store_dir),
        ).select("h", "doc_id", "pos")
        base = docs.select("doc_id", F.expr(TOKENS_EXPR).alias("toks"))
        k = self.k
        lit_expr = (
            f"transform(sequence(0, size(toks) - {k}), "
            f"i -> named_struct('pos', i, 'w', "
            f"array_join(slice(toks, i + 1, {k}), ' ')))"
        )
        lits = (
            base.filter(F.size("toks") >= k)
            .select("doc_id", F.explode(F.expr(lit_expr)).alias("x"))
            .select(
                "doc_id",
                F.col("x.pos").alias("pos"),
                F.col("x.w").alias("w"),
                F.expr(
                    "CAST(conv(substring(md5(x.w), 1, 15), 16, 10) AS BIGINT)"
                ).alias("h"),
            )
        )
        n_hashes = store.count()
        n_collisions = (
            lits.join(store.select("h"), "h", "left_semi")
            .groupBy("h")
            .agg(F.countDistinct("w").alias("nw"))
            .filter(F.col("nw") > 1)
            .count()
        )
        n_orphans = store.join(lits.select("h"), "h", "left_anti").count()
        n_owner_mismatch = store.join(
            lits.select("h", "doc_id", "pos"), ["h", "doc_id", "pos"], "left_anti"
        ).count()
        return spark.createDataFrame(
            [(n_hashes, n_collisions, n_orphans, n_owner_mismatch)],
            "n_store_hashes long, n_collisions long, "
            "n_orphan_hashes long, n_owner_mismatches long",
        )

    def compact(self, spark) -> None:
        """Fold per-batch hash partitions into the -1 baseline (bounds
        file count; crash-atomic swap; folded-batch replays pruned).
        Hashes are globally unique across live partitions by
        construction, but a replayed-then-compacted edge can leave two
        owners — keep the FIRST (min (doc_id, pos)), the operator's
        keep-first law."""
        recover_store(self.store_dir)
        ct = compacted_through(self.store_dir)
        live = visible(spark.read.parquet(self.store_dir), ct)
        new_ct = max(ct, max_live_batch(live))
        merged = (
            live.groupBy("h")
            .agg(F.min(F.struct("doc_id", "pos")).alias("o"))
            .select("h", F.col("o.doc_id").alias("doc_id"), F.col("o.pos").alias("pos"))
            .withColumn("ingest_batch_id", F.lit(BASELINE_ID))
        )
        compact_partitioned_store(self.store_dir, merged, new_ct)
