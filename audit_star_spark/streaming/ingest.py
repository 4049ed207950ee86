"""Structured Streaming capture path (EP2 of SURVEY §3).

The reference captures changes with an in-transaction trigger
(audit.go:872–926) — synchronous, totally ordered by a PG sequence. Spark
has no in-transaction hook, so capture is a micro-batch streaming job over
a change feed:

    readStream(change events) -> foreachBatch:
        assign gapless audit ids continuing from checkpointed offset
        build audit records (operators.event_builder)
        append to the log table

Sequence state (the ``nextval`` analogue, audit.go:855–867) lives in a
JSON state file next to the Spark checkpoint; batches are idempotent via
recorded batch_id -> base-offset mapping, so foreachBatch replays after
failure do not double-assign ids or double-append (the replayed batch
overwrites its own deterministic output partition directory).

Append-only enforcement (A12, audit.go:627–645): the log is only ever
touched through ``_append_batch``; there is no update/delete surface at
all — the property the reference needs a guard trigger for is structural
here.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEED_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
        T.StructField("changed_at", T.TimestampType()),
        T.StructField("changed_by", T.StringType()),
        T.StructField("db_user", T.StringType()),
        T.StructField("client_addr", T.StringType()),
        T.StructField("client_port", T.IntegerType()),
    ]
)


class SequenceState:
    """Checkpointed per-table sequence offset with batch idempotence."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {"next_id": 1, "batches": {}}

    def base_for_batch(self, batch_id: int) -> tuple[int, bool]:
        """(base offset for this batch, already_processed)."""
        st = self.load()
        key = str(batch_id)
        if key in st["batches"]:
            return st["batches"][key], True
        return st["next_id"], False

    def commit_batch(self, batch_id: int, base: int, n_rows: int) -> None:
        st = self.load()
        st["batches"][str(batch_id)] = base
        st["next_id"] = max(st["next_id"], base + n_rows)
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, self.path)


class AuditIngest:
    """Per-table streaming capture job (the trigger analogue, C9)."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        log_dir: str,
        checkpoint_dir: str,
        pk_col: str | None,
        log_client_query: bool = False,
        max_files_per_trigger: int | None = None,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.log_dir = log_dir
        self.checkpoint_dir = checkpoint_dir
        self.pk_col = pk_col
        self.log_client_query = log_client_query
        self.max_files_per_trigger = max_files_per_trigger
        self.state = SequenceState(os.path.join(checkpoint_dir, "sequence.json"))
        self.query = None

    def _append_batch(self, batch: DataFrame, batch_id: int) -> None:
        from audit_star_spark.operators.event_builder import build_audit_events

        base, seen = self.state.base_for_batch(batch_id)
        batch = batch.persist()
        n = batch.count()
        if n == 0:
            batch.unpersist()
            return
        events = build_audit_events(
            batch,
            pk_col=self.pk_col,
            order_by=["event_id"],
            log_client_query=self.log_client_query,
            id_start=base,
        ).withColumn("__batch", F.lit(batch_id))
        # partition by batch id: a replayed batch overwrites exactly its own
        # directory (dynamic overwrite) => idempotent append
        (
            events.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(self.log_dir)
        )
        batch.unpersist()
        if not seen:
            self.state.commit_batch(batch_id, base, n)

    def start(self, available_now: bool = True):
        reader = (
            self.spark.readStream.schema(FEED_SCHEMA)
        )
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        stream = reader.parquet(self.source_dir)
        writer = (
            stream.writeStream.foreachBatch(self._append_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("append")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        self.query = writer.start()
        return self.query

    def stop(self) -> None:
        """Pause capture, keep checkpoint (the reference DISABLEs triggers
        rather than dropping them, audit.go:1024–1033)."""
        if self.query is not None:
            self.query.stop()

    def log(self) -> DataFrame:
        return self.spark.read.parquet(self.log_dir).drop("__batch")
