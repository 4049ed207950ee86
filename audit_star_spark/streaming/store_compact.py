"""Crash-atomic, replay-safe compaction for the micro-batch parquet
stores (StreamingSCD2 / EventRollup / StreamingNearDup).

Two failure modes this module closes (both were documented hazards of
the in-place ``compact()`` the stores shipped with):

1. **Crash mid-overwrite lost the store.** The old compact eagerly
   localCheckpoint-ed the merged baseline and overwrote the live store
   path; a crash between the delete and the re-write left NEITHER the
   old nor the new contents on disk (checkpoint blocks die with the
   session). Here the merged baseline is written to a sibling temp dir
   and installed with a two-rename swap; every crash window leaves the
   store readable with pre- OR post-compaction contents, never neither.
   Dropping the localCheckpoint is also the scale win: the baseline
   streams from the live store's lineage straight to the temp dir —
   nothing is materialized in session memory, so a 100 TB store compacts
   with the same code path as a 100 MB one.

2. **A batch replayed AFTER compaction double-counted.** foreachBatch is
   at-least-once: if micro-batch N's partition was written but the
   streaming checkpoint commit was lost, the restarted query re-runs
   batch N. Pre-compaction that is idempotent (dynamic partition
   overwrite rewrites exactly partition N); but once compact() folded
   partition N into the ``ingest_batch_id=-1`` baseline, the replay
   re-creates partition N NEXT TO the baseline copy — duplicate
   audit_ids / signatures / partial aggregates. The swap therefore
   records the highest folded batch id in ``_compaction_meta.json``
   (name starts with ``_`` so parquet readers ignore it), and every
   read path filters to ``ingest_batch_id = -1 OR ingest_batch_id >
   compacted_through``. The filter is on the partition column —
   replayed-folded partitions are pruned at planning time, zero I/O.

Swap protocol (local-fs rename is atomic; on an object store the same
protocol runs over the committer's rename abstraction)::

    write baseline -> <store>.compact-tmp        (Spark parquet write)
    write _compaction_meta.json into tmp          <- completion marker
    rename <store>      -> <store>.compact-old
    rename tmp          -> <store>
    delete old

``recover_store()`` rolls an interrupted swap forward (tmp complete:
marker present) or back (tmp incomplete / old present) and is invoked by
every read AND every write path — a restarted streaming query must not
re-create the store dir next to an un-rolled-forward tmp, which would
make recovery discard the folded baseline.

Concurrency contract: ``compact()`` itself must not race a live ingest
OR a concurrent read — run it between triggers, like log compaction.
Reads and writes during the (long) baseline-write phase are harmless —
the live store is untouched and ``recover_store`` never sweeps the
compactor's in-progress tmp dir (stray tmp dirs are swept only by the
next ``atomic_swap``) — but a read landing inside the microsecond
rename window could roll the swap forward concurrently with the
compactor's own rename and fail one of the two.

**Checkpoint lineage.** A compacted store is BOUND to the streaming
checkpoint lineage that fed it: ``visible()`` assumes a batch id at or
below ``compacted_through`` can only recur as an at-least-once REPLAY of
a batch already folded into the baseline. Re-pointing the same store at
a fresh/reset checkpoint restarts batch ids at 0, and every new batch
would be silently pruned — silent data loss. The stores therefore
record the owning streaming query id (``_query_lineage.json``; Spark
persists the id in the checkpoint's ``metadata`` file, so it is stable
across restarts from the same checkpoint and fresh for a new one) and
``verify_lineage()`` refuses to start an ingest against a compacted
store whose bound id does not match the checkpoint's. An uncompacted
store is re-bound with a warning instead: batch-id partitions are
dynamically overwritten there, which is the documented idempotent-replay
semantics, not silent pruning.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META = "_compaction_meta.json"
LINEAGE = "_query_lineage.json"
BASELINE_ID = -1


def _tmp(store_path: str) -> str:
    return store_path + ".compact-tmp"


def _old(store_path: str) -> str:
    return store_path + ".compact-old"


def recover_store(store_path: str) -> None:
    """Make an interrupted swap whole. Idempotent; call before ANY read
    or write of the store. While the live store dir exists this is a
    near-no-op: in particular it must NOT sweep ``<store>.compact-tmp``,
    which may be an in-progress compaction's half-written baseline (a
    read racing the write phase would otherwise delete it out from under
    the compactor). Stray tmp dirs from a crashed-incomplete compaction
    are harmless junk (no completion marker) and are swept by the next
    ``atomic_swap``."""
    tmp, old = _tmp(store_path), _old(store_path)
    if os.path.isdir(store_path):
        # swap completed (old left behind by a crash after the final
        # rename): finish the delete. tmp is left alone — see above.
        shutil.rmtree(old, ignore_errors=True)
        return
    if os.path.isdir(tmp) and os.path.isfile(os.path.join(tmp, META)):
        # crashed between the two renames with a COMPLETE tmp: forward
        os.rename(tmp, store_path)
        shutil.rmtree(old, ignore_errors=True)
    elif os.path.isdir(old):
        # tmp incomplete (no marker): roll back to the old contents
        shutil.rmtree(tmp, ignore_errors=True)
        os.rename(old, store_path)
    # else: the store never existed — first ingest will create it


def compacted_through(store_path: str) -> int:
    """Highest batch id folded into the baseline; -1 if never compacted
    (every non-negative partition is then live)."""
    p = os.path.join(store_path, META)
    if os.path.isfile(p):
        with open(p) as f:
            return int(json.load(f)["compacted_through"])
    return BASELINE_ID


def checkpoint_query_id(checkpoint: str) -> str | None:
    """The streaming query id Spark persisted in this checkpoint's
    ``metadata`` file — stable across restarts from the same checkpoint,
    absent for a checkpoint no query has ever started on."""
    p = os.path.join(checkpoint, "metadata")
    if not os.path.isfile(p):
        return None
    try:
        with open(p) as f:
            qid = json.load(f).get("id")
        return str(qid) if qid else None
    except (ValueError, OSError):
        return None


def bound_query_id(store_path: str) -> str | None:
    """The query id this store is bound to; None if unbound."""
    p = os.path.join(store_path, LINEAGE)
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return str(json.load(f)["query_id"])


def verify_lineage(store_path: str, checkpoint: str) -> None:
    """Refuse to ingest into a COMPACTED store from a checkpoint other
    than the one that fed it (module docstring, "Checkpoint lineage"):
    a fresh checkpoint restarts batch ids at 0 and ``visible()`` would
    silently prune every new batch at or below ``compacted_through``.
    Call BEFORE ``writeStream.start()``. An uncompacted store, or one
    explicitly unbound (delete ``_query_lineage.json``), passes."""
    recover_store(store_path)
    bound = bound_query_id(store_path)
    if bound is None:
        return
    qid = checkpoint_query_id(checkpoint)
    if qid == bound:
        return
    if compacted_through(store_path) > BASELINE_ID:
        raise RuntimeError(
            f"store {store_path} was compacted under streaming query "
            f"{bound}, but checkpoint {checkpoint} belongs to "
            f"{qid or 'a fresh query (no metadata yet)'}: its batch ids "
            "restart at 0 and every batch <= compacted_through would be "
            "silently pruned as a replay. Resume from the original "
            f"checkpoint, or re-ingest into a new store; to override, "
            f"delete {os.path.join(store_path, LINEAGE)}."
        )
    import warnings

    warnings.warn(
        f"store {store_path} is being re-bound from streaming query "
        f"{bound} to a different checkpoint lineage ({checkpoint}); its "
        "batch-id partitions will be dynamically overwritten by the new "
        "query's batches",
        stacklevel=2,
    )


def bind_lineage(store_path: str, query_id: str) -> None:
    """Record (or re-record) the owning streaming query id. Creates the
    store dir if the first micro-batch has not landed yet."""
    os.makedirs(store_path, exist_ok=True)
    with open(os.path.join(store_path, LINEAGE), "w") as f:
        json.dump({"query_id": str(query_id)}, f)


def visible(df: DataFrame, ct: int) -> DataFrame:
    """Drop partitions of batches already folded into the baseline —
    exactly the rows a post-compaction replay could have duplicated.
    Partition-column predicate: pruned at planning time."""
    if ct <= BASELINE_ID:
        return df
    return df.filter(
        (F.col("ingest_batch_id") == BASELINE_ID)
        | (F.col("ingest_batch_id") > ct)
    )


def atomic_swap(
    store_path: str,
    write_tmp: Callable[[str], None],
    new_compacted_through: int,
) -> None:
    """Install a freshly-written baseline over the live store. write_tmp
    receives the temp path and must leave a complete parquet dataset
    there (it reads from the LIVE store — never from a half-written
    one, because the live store is untouched until the final renames)."""
    recover_store(store_path)
    tmp, old = _tmp(store_path), _old(store_path)
    shutil.rmtree(tmp, ignore_errors=True)
    write_tmp(tmp)
    # carry the checkpoint-lineage binding across the swap
    lineage = os.path.join(store_path, LINEAGE)
    if os.path.isfile(lineage):
        shutil.copyfile(lineage, os.path.join(tmp, LINEAGE))
    with open(os.path.join(tmp, META), "w") as f:
        json.dump({"compacted_through": int(new_compacted_through)}, f)
    os.rename(store_path, old)
    os.rename(tmp, store_path)
    shutil.rmtree(old)


def compact_partitioned_store(store_path: str, merged: DataFrame, ct: int) -> None:
    """The shared tail of every store's compact(): write ``merged``
    (already filtered to visible rows and stamped ingest_batch_id=-1)
    to the temp dir and swap."""

    def write_tmp(tmp: str) -> None:
        (
            merged.write.mode("overwrite")
            .partitionBy("ingest_batch_id")
            .parquet(tmp)
        )

    atomic_swap(store_path, write_tmp, ct)


def max_live_batch(df: DataFrame) -> int:
    """Highest non-negative batch id present (driver-side scalar; the
    agg runs on the partition column only)."""
    row = df.select(F.max("ingest_batch_id").alias("m")).collect()[0]
    return int(row["m"]) if row["m"] is not None else BASELINE_ID
