"""Lineage control for driver-side fixpoint loops (PageRank, BPE
training, min-label propagation).

Every iterative operator in this package materializes each round and
truncates lineage — otherwise round N's plan replays rounds 1..N-1.
Two ways to do that, with opposite fault-tolerance trades:

- ``localCheckpoint`` (the default): blocks live in executor storage,
  truncation is free of disk I/O, and eager blocks release when the
  frame is unreferenced. But the truncated lineage is NOT recomputable:
  losing an executor mid-iteration loses blocks with no recovery path —
  a long PageRank restarts from zero on any node failure. The right
  trade on a single-JVM local[*] runner and for short loops.
- reliable ``checkpoint(dir)`` (opt-in via ``checkpoint_dir``): each
  round is written to the (HDFS-compatible) checkpoint directory, so an
  executor or even driver-adjacent failure recovers by re-reading the
  last round from stable storage instead of recomputing or dying. Costs
  one distributed write per materialization; at 1000-executor scale
  with hour-long iterations this is the only safe mode. Files persist
  under ``checkpoint_dir`` for the session lifetime — point it at a
  job-scoped path and clean it with the job.

``iter_materialize`` is the single switch point; operators thread their
``checkpoint_dir`` parameter straight through it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def iter_materialize(
    df: DataFrame, checkpoint_dir: str | None = None, eager: bool = True
) -> DataFrame:
    """Materialize one iteration round with truncated lineage — session
    localCheckpoint by default, reliable checkpoint into
    ``checkpoint_dir`` when given (module docstring has the trade)."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    # setCheckpointDir mints a UUID subdir, so remember the base we set
    if getattr(sc, "_iter_checkpoint_base", None) != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
        sc._iter_checkpoint_base = checkpoint_dir
    return df.checkpoint(eager=eager)
