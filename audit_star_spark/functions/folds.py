"""Float reductions with a gate/production switch — ONE definition of
the repo's two summation conventions, shared by every module whose
aggregation groups grow with the corpus.

The repo's oracle gate (DuckDB rows+schema+HASH at sf0.01) demands
BIT-identical floats from two engines, so gate paths fold the SORTED
collected values of each group: ``aggregate(array_sort(collect_list(x))
, 0.0, (s, v) -> s + v)`` — a canonical summation order both engines
replay exactly. That is correct but NOT an algebraic aggregate:
``collect_list`` materializes the whole group in one aggregation buffer
and the shuffle carries every element. For a group whose size is
proportional to the corpus (covariance products per (i, j), gradient
terms per feature, members per k-means cell) that is a scale-killer —
at 100 TB the buffer is gigabytes and the executor OOMs.

``fold_sum(col, bit_exact)`` is the switch:

- ``bit_exact=True`` (the gate default): the sorted fold above.
  Use ONLY where the group is bounded (O(D), O(k), O(n_probe)) or
  where the caller is the oracle gate itself.
- ``bit_exact=False`` (production): plain ``SUM(x)`` — a true
  algebraic aggregate with map-side partial aggregation, so the
  shuffle carries ONE partial per task per group and buffers are O(1)
  in corpus size. Float addition is not associative, so the result can
  differ from the gate path in the last ulps; callers that thread
  ``bit_exact`` must carry a parity test pinning agreement at 1e-9 on
  a fixture (tests/test_folds_parity.py).

The reference point for shipping both forms side by side is
``gapless_ids``' ``mode=`` switch (operators/ids.py): gate-exact and
production paths as one API, plan-locked where the shape matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SORTED_FOLD = (
    "aggregate(array_sort(collect_list({0})), "
    "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
)


def sorted_stream_sum(
    df: DataFrame, keys: list[str], value_col: str, out: str
) -> DataFrame:
    """Bit-exact ascending-order group sum as a STREAMED aggregation —
    the same value as SORTED_FOLD without its O(group) collect_list
    buffer: repartition by the group keys (every group lands whole in
    one task), sort within partitions by (keys..., value), and let the
    aggregate accumulate in scan order — which IS the array_sort
    ascending order, so the result is bit-identical to the sorted fold
    while per-group state is one double and the in-partition sort
    spills gracefully where collect_list would OOM.

    Two physical preconditions, pinned by tests/test_folds_parity.py
    (value parity vs the fold expression AND the plan shape — the Sort
    must survive below the first aggregate):
    - the group count per task must stay within the hash-aggregate map
      (no sort-based fallback mid-stream), which holds for the
      bounded-key uses this is meant for (D^2 covariance cells,
      per-dimension means);
    - rows of one group must all reach one task BEFORE any partial
      aggregation, which the explicit repartition guarantees.
    Returns ``df.groupBy(keys)`` with ``out`` = the ordered sum."""
    return (
        df.repartition(*keys)
        .sortWithinPartitions(*keys, value_col)
        .groupBy(*keys)
        .agg(F.sum(value_col).alias(out))
    )


def fold_sum(col_sql: str, bit_exact: bool = True) -> str:
    """SQL aggregate over column expression ``col_sql``: the
    bit-deterministic sorted fold (gate) or plain ``SUM`` (production,
    map-side combinable, O(1) buffers). Returns a SQL string for
    ``F.expr`` inside ``groupBy(...).agg(...)``."""
    if bit_exact:
        return SORTED_FOLD.format(col_sql)
    return f"SUM(CAST(({col_sql}) AS DOUBLE))"
