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
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META = "_compaction_meta.json"
BASELINE_ID = -1


def _tmp(store_path: str) -> str:
    return store_path + ".compact-tmp"


def _old(store_path: str) -> str:
    return store_path + ".compact-old"


def recover_store(store_path: str) -> None:
    """Make an interrupted swap whole. Idempotent; call before ANY read
    or write of the store."""
    tmp, old = _tmp(store_path), _old(store_path)
    if os.path.isdir(store_path):
        # swap never started, or already completed: stray dirs are junk
        shutil.rmtree(tmp, ignore_errors=True)
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
