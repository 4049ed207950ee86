"""Materialized audit-log store.

In the reference, the audit log is a physical append-only table written by
the trigger and *queried* by the views (audit.go:773–816); recomputing it
per query would be nonsense. This module mirrors that: the log built from a
change feed is staged once to parquet and every view/query reads the staged
table.

Physical layout (the Spark analogue of the reference's two indexes,
audit.go:836–837): range-partitioned by (primary_key, audit_id) and sorted
within partitions — reconstruction windows get co-located keys, and parquet
row-group min/max stats give point-lookup pruning on primary_key and
``sparse_time IS NOT NULL`` anchor scans for free.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from audit_star_spark.catalog import TableSpec

CACHE_ROOT = os.environ.get("AUDIT_STAR_CACHE_DIR", "/tmp/audit_star_spark/cache")


def _fingerprint(sf_dir: str) -> str:
    ev = os.path.join(sf_dir, "events.parquet")
    st = os.stat(ev)
    key = f"{os.path.abspath(sf_dir)}:{st.st_size}:{int(st.st_mtime)}"
    return hashlib.sha1(key.encode()).hexdigest()[:16]


def cached_users_log(
    spark: SparkSession, sf_dir: str, payload: bool = False
) -> tuple[DataFrame, DataFrame, TableSpec]:
    """(log, live, spec) for the synthetic users table, with the log staged
    to parquet on first use per dataset. ``payload=True`` stages the
    full-fidelity variant (``store_insert_payload`` — INSERTs carry the
    row image, enabling log-only reconstruction). Set
    AUDIT_STAR_NO_LOG_CACHE=1 to force the pure in-memory pipeline (used
    by tests to cover both paths).
    """
    from audit_star_spark.operators.event_builder import build_audit_events
    from audit_star_spark.sources.cdc import users_audit_inputs

    feed, live, spec = users_audit_inputs(spark, sf_dir)
    if os.environ.get("AUDIT_STAR_NO_LOG_CACHE") == "1":
        log = build_audit_events(
            feed, pk_col="id", order_by=["event_id"], store_insert_payload=payload
        )
        return log, live, spec

    fp = _fingerprint(sf_dir)
    path = os.path.join(CACHE_ROOT, "users_log_payload" if payload else "users_log", fp)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        log = build_audit_events(
            feed, pk_col="id", order_by=["event_id"], store_insert_payload=payload
        )
        n = max(2, spark.sparkContext.defaultParallelism // 4)
        (
            log.repartitionByRange(n, "primary_key", "audit_id")
            .sortWithinPartitions("primary_key", "audit_id")
            .write.mode("overwrite")
            .parquet(path)
        )
    # the live snapshot (latest row per user, a full window over the feed)
    # is consumed by every reconstruction query — stage it once too; it is
    # the moving-target side the reference re-reads per query (B3), which
    # our as-of semantics pin anyway
    live_path = os.path.join(CACHE_ROOT, "users_live", fp)
    if not os.path.exists(os.path.join(live_path, "_SUCCESS")):
        live.write.mode("overwrite").parquet(live_path)
    return spark.read.parquet(path), spark.read.parquet(live_path), spec


def compact_log(
    spark: SparkSession, log_dir: str, target_files: int | None = None
) -> int:
    """Compact a streaming audit log in place: every committed
    ``__batch=N`` directory is rewritten into ONE range-partitioned,
    (primary_key, audit_id)-sorted segment stored as ``__batch=-1``.

    Streaming appends create one small directory per micro-batch; at scale
    the log becomes a small-files problem and reconstruction loses the
    sorted-layout pruning. Compaction restores the query-optimal layout
    while preserving ingest semantics:

    - replay idempotence is untouched: foreachBatch replays only the last
      uncommitted batch, which still owns its own ``__batch=N`` directory;
      the ``-1`` segment is never a replay target;
    - the sequence checkpoint is not involved (ids are already assigned);
    - subsequent batches keep appending their own directories until the
      next compaction folds them in.

    Run while ingest is paused (same rule as any table-maintenance job).
    Returns the number of rows compacted; raises if the rewrite would lose
    rows (the old layout is left untouched in that case).
    """
    df = spark.read.parquet(log_dir)
    n_before = df.count()
    if n_before == 0:
        return 0
    n_files = target_files or max(2, spark.sparkContext.defaultParallelism // 4)
    tmp = log_dir.rstrip("/") + "__compact_tmp"
    (
        df.drop("__batch")
        .repartitionByRange(n_files, "primary_key", "audit_id")
        .sortWithinPartitions("primary_key", "audit_id")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    n_after = spark.read.parquet(tmp).count()
    if n_after != n_before:  # pragma: no cover — safety net
        raise RuntimeError(f"compaction row mismatch: {n_before} -> {n_after}")
    import shutil

    for entry in os.listdir(log_dir):
        if entry.startswith("__batch="):
            shutil.rmtree(os.path.join(log_dir, entry))
    seg = os.path.join(log_dir, "__batch=-1")
    os.makedirs(seg, exist_ok=True)
    for entry in os.listdir(tmp):
        if entry.endswith(".parquet"):
            os.replace(os.path.join(tmp, entry), os.path.join(seg, entry))
    shutil.rmtree(tmp)
    # sanctioned maintenance: re-baseline the append-only guard so the
    # rewritten layout isn't reported as DML (plans.append_guard)
    from audit_star_spark.plans.append_guard import AppendOnlyGuard

    AppendOnlyGuard(log_dir).reset()
    return n_before
