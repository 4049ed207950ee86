"""Streaming bitext mining — assign-on-ingest, margins at read.

The batch operator (analytics/similarity.py bitext_mine) is
CORPUS-RELATIVE: the margin denominator is each vector's mean cosine to
its k nearest opposite-side candidates, and the mined pair is a per-
source argmax over everything seen — so per-batch verdicts frozen at
ingest would diverge from the batch semantics the moment a later batch
lands a better candidate (the streaming/ccnet.py lesson). The streaming
form therefore persists the only thing that IS mergeable: the assigned
vector rows.

- centroids are FROZEN at store creation (``ensure_centroids`` — the
  StreamingIVFIngest convention: a coarse quantizer is trained offline
  and retrained on a schedule, never silently per-batch) and live in a
  SIBLING directory (a subdir would read as a phantom partition of the
  row store);
- per micro-batch: one broadcast-centroid assignment pass over the
  batch's vectors (``_sided_assignment`` — the exact code path batch
  mining runs), appended to a batch-id partition with dynamic overwrite
  (idempotent under at-least-once replay, the shared store contract);
- ``mine()`` runs ``_bitext_mine_from_assigned`` — the batch core, one
  code path — over the visible rows, so the result EQUALS batch
  bitext_mine of everything ingested with the same frozen centroids
  (parity test-locked).

Store size is O(corpus) rows — mining is pairwise over the corpus, so
the assigned rows ARE the minimal state; what the stream saves is the
repeated assignment scan, not the candidate join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audit_star_spark.analytics.similarity import (
    VEC_EXPR,
    _bitext_mine_from_assigned,
    _centroid_frame,
    _sided_assignment,
    with_norm,
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

_COLS = ("vec_id", "side", "vec", "norm", "cell_id")


class StreamingBitextMiner:
    def __init__(
        self,
        store_dir: str,
        k: int = 4,
        threshold: float = 1.05,
        side=None,
    ):
        self.store_dir = store_dir
        self.cent_dir = store_dir + "_centroids"
        self.k = k
        self.threshold = threshold
        self.side = side

    def ensure_centroids(self, centroids: DataFrame) -> None:
        """Freeze the coarse quantizer: write (cell_id, embedding) once;
        a store that already has centroids keeps them (mode=ignore) —
        retraining is an explicit new store, never a silent drift."""
        centroids.select("cell_id", "embedding").write.mode("ignore").parquet(
            self.cent_dir
        )

    def _cents(self, spark: SparkSession) -> DataFrame:
        if not os.path.isdir(self.cent_dir):
            raise ValueError(
                f"no frozen centroids at {self.cent_dir}; call "
                "ensure_centroids() before ingesting"
            )
        return _centroid_frame(spark.read.parquet(self.cent_dir))

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        recover_store(self.store_dir)
        side = self.side if self.side is not None else F.col("label") % 2
        base = with_norm(
            batch_df.withColumn("side", side).select(
                "vec_id", "side", F.expr(VEC_EXPR).alias("vec")
            )
        )
        assigned = _sided_assignment(base, self._cents(batch_df.sparkSession))
        (
            assigned.withColumn("ingest_batch_id", F.lit(batch_id))
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

    def _assigned(self, spark: SparkSession) -> DataFrame | None:
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
        return visible(df, compacted_through(self.store_dir)).select(*_COLS)

    def mine(self, spark: SparkSession) -> DataFrame | None:
        """Batch bitext_mine of everything ingested so far (parity
        test-locked): (src_id, tgt_id, cos6, margin6, mutual)."""
        assigned = self._assigned(spark)
        if assigned is None:
            return None
        return _bitext_mine_from_assigned(assigned, self.k, self.threshold)

    def compact(self, spark: SparkSession) -> None:
        """Fold per-batch row partitions into the -1 baseline; rows are
        the state (no merge aggregation), so compaction is a rewrite
        that is invisible to reads by construction."""
        recover_store(self.store_dir)
        if not os.path.isdir(self.store_dir):
            return
        ct = compacted_through(self.store_dir)
        live = visible(spark.read.parquet(self.store_dir), ct)
        new_ct = max(ct, max_live_batch(live))
        compact_partitioned_store(
            self.store_dir,
            live.select(*_COLS).withColumn(
                "ingest_batch_id", F.lit(BASELINE_ID)
            ),
            new_ct,
        )
