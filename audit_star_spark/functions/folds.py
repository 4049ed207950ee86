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

SORTED_FOLD = (
    "aggregate(array_sort(collect_list({0})), "
    "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
)


def fold_sum(col_sql: str, bit_exact: bool = True) -> str:
    """SQL aggregate over column expression ``col_sql``: the
    bit-deterministic sorted fold (gate) or plain ``SUM`` (production,
    map-side combinable, O(1) buffers). Returns a SQL string for
    ``F.expr`` inside ``groupBy(...).agg(...)``."""
    if bit_exact:
        return SORTED_FOLD.format(col_sql)
    return f"SUM(CAST(({col_sql}) AS DOUBLE))"
