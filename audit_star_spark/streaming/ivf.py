"""Streaming maintenance for the persisted IVF index: assign-on-ingest.

A 100 TB corpus is not embedded once — shards arrive continuously, and
re-running ``build_ivf_index`` per arrival re-trains and re-writes the
whole index. This operator keeps the trained coarse quantizer FROZEN
(the standard IVF production practice: centroids drift slowly; retrain
is a scheduled offline job) and maintains the index incrementally:

- per micro-batch (foreachBatch): assign the batch's vectors to cells
  with the broadcast persisted centroids — one narrow pass, no shuffle —
  and append them to a batch-id + cell-id partitioned side store with
  dynamic partition overwrite (idempotent under at-least-once replay,
  the same contract as the SCD2 / rollup / near-dup stores);
- ``assignments()`` / ``probe()`` see baseline ∪ visible side store, so
  queries run against the live corpus without any index rewrite; probe
  partition-prunes BOTH sources on the probed cell ids;
- ``merge_into_index()`` folds the side store into the index's
  assignment parquet with the crash-atomic two-rename swap
  (store_compact.atomic_swap); the swap records the highest folded
  batch id in the index dir, so a batch replayed after a merge is
  pruned from the union instead of double-counting — the identical
  replay-safety design the streaming stores use, applied to the index.

The side store is bound to its streaming checkpoint lineage
(verify_lineage) exactly like the other stores: once a merge has
recorded folded batch ids, a fresh checkpoint restarting ids at 0 would
be silently pruned, so it is refused.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.ivf_index import IVFIndex
from audit_star_spark.analytics.similarity import VEC_EXPR, _dot
from audit_star_spark.streaming.store_compact import (
    BASELINE_ID,
    atomic_swap,
    bind_lineage,
    compacted_through,
    max_live_batch,
    recover_store,
    verify_lineage,
    visible,
)


class StreamingIVFIngest:
    """Incremental assignment maintenance for an :class:`IVFIndex`."""

    def __init__(self, index_dir: str, store_dir: str):
        self.index = IVFIndex(index_dir)
        self.store_dir = store_dir
        # PQ codes for not-yet-merged batches live in a SIBLING store
        # (a subdir would read as a phantom partition of the assignment
        # store); only populated when the index carries PQ artifacts
        self.pq_store_dir = store_dir + "_pq"
        # OPQ rotation cache: (pq-meta fingerprint, persisted rot frame,
        # dim) — the coefficients are frozen like the centroids, so one
        # read serves every micro-batch (invalidated if the meta changes,
        # i.e. the index was retrained between batches)
        self._rot_cache: tuple[str, DataFrame, int] | None = None

    def _pq_meta(self) -> dict | None:
        import json

        from audit_star_spark.analytics.ivf_index import PQ_META

        p = os.path.join(self.index.index_dir, PQ_META)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _opq_rotation(self, spark, meta: dict) -> tuple[DataFrame, int]:
        """The persisted OPQ rotation, loaded and pinned ONCE per ingest
        object instead of re-read every micro-batch inside foreachBatch.
        The D/2-row frame persists eagerly; a changed PQ meta (index
        retrain between batches) invalidates and releases the old one."""
        import json

        fp = json.dumps(meta, sort_keys=True)
        if self._rot_cache is None or self._rot_cache[0] != fp:
            rot = spark.read.parquet(
                os.path.join(self.index.index_dir, "opq_rotation")
            )
            rot.persist()
            rot.count()  # eager: pin before the first batch uses it
            if self._rot_cache is not None:
                self._rot_cache[1].unpersist()
            self._rot_cache = (fp, rot, int(self.index.meta()["dim"]))
        return self._rot_cache[1], self._rot_cache[2]

    # ------------------------------------------------------------ ingest

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Assign one micro-batch (vec_id, label, embedding) with the
        frozen centroids and write its partition (idempotent)."""
        spark = batch_df.sparkSession
        recover_store(self.store_dir)
        cents = self.index.centroids(spark).select(
            "cell_id",
            F.col("centroid").alias("cvec"),
            F.col("cnorm").alias("cnorm"),
        )
        base = batch_df.select(
            "vec_id", "label", F.expr(VEC_EXPR).alias("vec")
        ).withColumn("norm", F.sqrt(_dot("vec", "vec")))
        ccos = _dot("cvec", "vec") / (F.col("cnorm") * F.col("norm"))
        from pyspark.sql import Window

        wc = Window.partitionBy("vec_id").orderBy(
            F.col("ccos").desc(), F.col("cell_id")
        )
        assigned = (
            base.join(F.broadcast(cents))
            .select("vec_id", "label", "vec", "norm", "cell_id", ccos.alias("ccos"))
            .withColumn("crank", F.row_number().over(wc))
            .filter(F.col("crank") == 1)
            .select("vec_id", "label", "vec", "norm", "cell_id")
        )
        (
            assigned.withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id", "cell_id")
            .parquet(self.store_dir)
        )
        # if the index carries PQ artifacts, streamed vectors must also
        # earn codes or probe_pq would silently miss them: encode with
        # the PERSISTED codebook (frozen, like the centroids) — residual
        # or raw per the index's own meta — into the sibling PQ store
        # with the same idempotent partition layout
        meta = self._pq_meta()
        if meta is not None:
            from audit_star_spark.analytics.pq import pq_encode

            recover_store(self.pq_store_dir)
            cb = spark.read.parquet(
                os.path.join(self.index.index_dir, "pq_codebook")
            )
            if meta.get("by_residual", False):
                enc_in = assigned.join(
                    F.broadcast(cents.select("cell_id", "cvec")), "cell_id"
                ).select(
                    "vec_id",
                    F.expr("zip_with(vec, cvec, (x, y) -> x - y)").alias(
                        "embedding"
                    ),
                )
            else:
                enc_in = assigned.select(
                    "vec_id", F.col("vec").alias("embedding")
                )
            if meta.get("opq", False):
                # OPQ index: streamed vectors must rotate with the
                # PERSISTED coefficients before encoding, or their
                # codes would live in the wrong space
                from audit_star_spark.analytics.pq import opq_rotate

                rot, dim = self._opq_rotation(spark, meta)
                enc_in = opq_rotate(
                    enc_in.select(
                        "vec_id", F.expr(VEC_EXPR).alias("embedding")
                    ),
                    rot,
                    dim,
                    vec_col="embedding",
                )
            codes = pq_encode(enc_in, cb, m_sub=meta["m_sub"])
            (
                codes.join(assigned.select("vec_id", "cell_id"), "vec_id")
                .withColumn("ingest_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch_id", "cell_id")
                .parquet(self.pq_store_dir)
            )

    def start(self, vec_stream: DataFrame, checkpoint: str, available_now: bool = True):
        # once merge_into_index has folded batch ids, the union is bound
        # to this checkpoint lineage (store_compact module docstring).
        # The folded-batch record lives on the INDEX dir (the merge swap
        # wrote it there), so the generic verify — which looks at the
        # side store's own compaction meta — must be backed by an
        # explicit check against merged_through.
        from audit_star_spark.streaming.store_compact import (
            LINEAGE,
            bound_query_id,
            checkpoint_query_id,
        )

        bound = bound_query_id(self.store_dir) if os.path.isdir(self.store_dir) else None
        if (
            bound is not None
            and checkpoint_query_id(checkpoint) != bound
            and self._merged_through() > BASELINE_ID
        ):
            raise RuntimeError(
                f"side store {self.store_dir} fed merges under streaming "
                f"query {bound}; checkpoint {checkpoint} belongs to a "
                "different lineage, so its restarted batch ids would be "
                "silently pruned as already-merged replays. Resume from "
                "the original checkpoint or start a new side store; to "
                f"override, delete {os.path.join(self.store_dir, LINEAGE)}."
            )
        verify_lineage(self.store_dir, checkpoint)
        writer = vec_stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        bind_lineage(self.store_dir, str(query.id))
        return query

    # ------------------------------------------------------------- reads

    def _merged_through(self) -> int:
        """Highest side-store batch id already folded into the index's
        assignment parquet (recorded by merge_into_index's swap). Rolls
        an interrupted merge swap whole first — every read and write
        path must, or a crashed merge leaves the index dir renamed
        away."""
        recover_store(self.index._assignments_path)
        return compacted_through(self.index._assignments_path)

    def _store_assignments(self, spark) -> DataFrame | None:
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
        return visible(df, self._merged_through()).drop("ingest_batch_id")

    def assignments(self, spark) -> DataFrame:
        """The live corpus: baseline index assignments ∪ side-store
        batches not yet folded by merge_into_index."""
        recover_store(self.index._assignments_path)
        base = self.index.assignments(spark)
        side = self._store_assignments(spark)
        if side is None:
            return base
        return base.unionByName(side.select(*base.columns))

    def _pq_codes_path(self) -> str:
        return os.path.join(self.index.index_dir, "pq_codes")

    def _pq_merged_through(self) -> int:
        """Fold marker for the PQ side store — tracked on the index's
        pq_codes dir independently of the assignment marker, so a crash
        between the two merge swaps leaves each source pruning
        correctly against its own fold level."""
        recover_store(self._pq_codes_path())
        return compacted_through(self._pq_codes_path())

    def _store_pq_codes(self, spark) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        recover_store(self.pq_store_dir)
        if not os.path.isdir(self.pq_store_dir):
            return None
        try:
            df = spark.read.parquet(self.pq_store_dir)
        except AnalysisException as ex:
            cls = getattr(ex, "getErrorClass", lambda: None)() or ""
            if "PATH_NOT_FOUND" in cls or "UNABLE_TO_INFER_SCHEMA" in cls:
                return None
            raise
        return visible(df, self._pq_merged_through()).drop("ingest_batch_id")

    def probe_pq(
        self, queries: DataFrame, k: int = 10, n_probe: int = 4
    ) -> DataFrame:
        """IVF-PQ probe against the LIVE corpus: the analytics probe
        (per-cell residual ADC tables, static partition pruning, floats
        never read) with the side store's not-yet-merged codes unioned
        into the candidate scan."""
        from audit_star_spark.analytics.ivf_index import probe_pq

        spark = queries.sparkSession
        side = self._store_pq_codes(spark)
        return probe_pq(
            self.index, queries, k=k, n_probe=n_probe, extra_codes=side
        )

    def probe_pq_rerank(
        self,
        queries: DataFrame,
        k: int = 10,
        rerank: int = 50,
        n_probe: int = 4,
    ) -> DataFrame:
        """Two-stage serving against the LIVE corpus: the streaming
        probe_pq shortlist, exact-cosine re-ranked against the union
        read (baseline ∪ side-store vectors) — same refine semantics as
        the batch probe_pq_rerank, with the side store's vectors
        visible before any merge."""
        from pyspark.sql import Window

        from audit_star_spark.analytics.ivf_index import _rerank_shortlist

        if rerank < k:
            raise ValueError(f"rerank {rerank} must be >= k {k}")
        spark = queries.sparkSession
        cand = self.probe_pq(queries, k=rerank, n_probe=n_probe).select(
            "query_id", "vec_id"
        )
        # probed-cell static filter pushes through the union, pruning
        # BOTH the baseline and the side store's vector files
        q = queries.select(
            "query_id", "qvec", F.sqrt(_dot("qvec", "qvec")).alias("qnorm")
        )
        cents = self.index.centroids(spark).select(
            "cell_id", F.col("centroid").alias("cvec"), "cnorm"
        )
        ccos = _dot("qvec", "cvec") / (F.col("qnorm") * F.col("cnorm"))
        wc = Window.partitionBy("query_id").orderBy(
            F.col("ccos").desc(), F.col("cell_id")
        )
        cells = sorted(
            int(r["cell_id"])
            for r in q.join(F.broadcast(cents))
            .select("query_id", "cell_id", ccos.alias("ccos"))
            .withColumn("crank", F.row_number().over(wc))
            .filter(F.col("crank") <= n_probe)
            .select("cell_id")
            .distinct()
            .collect()
        )
        vecs = (
            self.assignments(spark)
            .filter(F.col("cell_id").isin(cells))
            .select("vec_id", "vec", "norm")
        )
        return _rerank_shortlist(cand, queries, vecs, k)

    def probe(self, queries: DataFrame, k: int = 10, n_probe: int = 4) -> DataFrame:
        """Top-k cosine against the live corpus; candidate scans of BOTH
        sources are partition-pruned to the probed cells."""
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        if n_probe <= 0:
            raise ValueError(f"n_probe must be positive, got {n_probe}")
        spark = queries.sparkSession
        from pyspark.sql import Window

        q = queries.select(
            "query_id",
            F.col("qvec").alias("qvec"),
            F.sqrt(_dot("qvec", "qvec")).alias("qnorm"),
        )
        cents = self.index.centroids(spark).select(
            "cell_id",
            F.col("centroid").alias("cvec"),
            F.col("cnorm").alias("cnorm"),
        )
        ccos = _dot("qvec", "cvec") / (F.col("qnorm") * F.col("cnorm"))
        wc = Window.partitionBy("query_id").orderBy(
            F.col("ccos").desc(), F.col("cell_id")
        )
        probes = (
            q.join(F.broadcast(cents))
            .select("query_id", "qvec", "qnorm", "cell_id", ccos.alias("ccos"))
            .withColumn("crank", F.row_number().over(wc))
            .filter(F.col("crank") <= n_probe)
            .select("query_id", "qvec", "qnorm", "cell_id")
            .persist()
        )
        cells = sorted(
            {int(r["cell_id"]) for r in probes.select("cell_id").distinct().collect()}
        )
        cand = self.assignments(spark).filter(F.col("cell_id").isin(cells))
        cos = _dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("vec_id")
        )
        out = (
            cand.join(F.broadcast(probes), "cell_id")
            .select("query_id", "vec_id", cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "cosine")
            .localCheckpoint(eager=True)
        )
        probes.unpersist()
        return out

    # ------------------------------------------------------------- merge

    def merge_into_index(self, spark) -> None:
        """Fold the side store into the index's assignment parquet —
        crash-atomic (two-rename swap; pre- or post-merge contents stay
        readable through any crash window) and replay-safe (the swap
        records the highest folded batch id; a replayed folded batch is
        pruned from every later union). Belt-and-braces: when a vec_id
        was re-ingested, only the newest copy (max ingest_batch_id;
        baseline counts as -1) survives the fold — the near-dup store's
        dedup rule. Must not race a live ingest or concurrent reads of
        the INDEX (it swaps the index's assignment dir)."""
        side = self._store_assignments(spark)
        if side is None:
            return
        recover_store(self.store_dir)
        store_df = visible(
            spark.read.parquet(self.store_dir), self._merged_through()
        )
        new_ct = max(self._merged_through(), max_live_batch(store_df))

        # fold the PQ side store FIRST (each store prunes against its
        # own marker, so either crash window leaves reads consistent:
        # a folded-but-unmarked source is impossible, and a marked
        # assignment fold with an unfolded PQ store keeps the PQ side
        # rows visible through the union)
        pq_side = self._store_pq_codes(spark)
        if pq_side is not None:
            recover_store(self.pq_store_dir)
            pq_store_df = visible(
                spark.read.parquet(self.pq_store_dir),
                self._pq_merged_through(),
            )
            pq_ct = max(self._pq_merged_through(), max_live_batch(pq_store_df))
            pq_base = spark.read.parquet(self._pq_codes_path()).withColumn(
                "ingest_batch_id", F.lit(BASELINE_ID)
            )
            pq_merged = pq_base.unionByName(
                pq_store_df.select(*pq_base.columns)
            )
            pq_dedup = pq_merged.groupBy("vec_id").agg(
                F.expr("max_by(codes, ingest_batch_id)").alias("codes"),
                F.expr("max_by(cell_id, ingest_batch_id)").alias("cell_id"),
            )

            def write_pq_tmp(tmp: str) -> None:
                pq_dedup.write.mode("overwrite").partitionBy("cell_id").parquet(tmp)

            atomic_swap(self._pq_codes_path(), write_pq_tmp, pq_ct)

        base = self.index.assignments(spark).withColumn(
            "ingest_batch_id", F.lit(BASELINE_ID)
        )
        merged = base.unionByName(store_df.select(*base.columns))
        payload = [
            c for c in merged.columns if c not in ("vec_id", "ingest_batch_id")
        ]
        deduped = merged.groupBy("vec_id").agg(
            *[F.expr(f"max_by({c}, ingest_batch_id)").alias(c) for c in payload]
        )

        def write_tmp(tmp: str) -> None:
            deduped.write.mode("overwrite").partitionBy("cell_id").parquet(tmp)

        atomic_swap(self.index._assignments_path, write_tmp, new_ct)
