"""Z-order (Morton) clustering — multi-column data skipping for parquet.

Sorting a table by ONE column gives parquet row-group min/max pruning on
that column only; range predicates on a second column still scan
everything. Interleaving the bits of several columns' rank spaces (the
Z-order / Morton curve, the layout behind Delta's OPTIMIZE ZORDER BY and
Databricks' liquid clustering) makes row groups simultaneously tight on
EVERY participating column, so conjunctive range predicates prune on all
of them at once.

Implementation is pure expression algebra:

1. each column maps to a bounded integer rank — here ``width``-bit
   quantiles of its min/max range (broadcast 1-row bounds), clamped;
2. the Morton key interleaves the per-column bits with an unrolled
   shift/mask expression generated in Python (identical in the DuckDB
   oracle — both engines evaluate the same closed form);
3. ``repartitionByRange`` + local sort on the key writes files whose
   row groups are hyper-rectangles in the column space.

At 100 TB the win is at read time: a predicate selecting p% of each of
two z-ordered columns reads ~p% of row groups instead of ~sqrt-of-noth—
the measured skip ratio is locked in tests/test_zorder.py against the
actual parquet row-group statistics pyarrow reports.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_expr(cols: list[str], width: int = 16) -> Column:
    """Bit-interleave ``width``-bit integer columns (already ranked into
    [0, 2^width)) into one BIGINT Morton key. Unrolled shift/mask
    algebra — the same expression string a SQL oracle can evaluate."""
    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError(f"morton_expr interleaves 1-4 columns, got {n}")
    if n * width > 62:
        raise ValueError(f"{n} x {width} bits overflows a signed BIGINT")
    terms = [
        f"(shiftright(CAST({c} AS BIGINT), {b}) & 1) << {b * n + j}"
        for j, c in enumerate(cols)
        for b in range(width)
    ]
    return F.expr("(" + " | ".join(terms) + ")")


def morton_sql(cols: list[str], width: int = 16) -> str:
    """DuckDB mirror of :func:`morton_expr` (operator spellings shared:
    >>, &, <<, | exist in both dialects; DuckDB needs explicit casts)."""
    n = len(cols)
    # DuckDB parses |, & and << at EQUAL precedence left-to-right (unlike
    # Spark/C), so every term must be fully parenthesized or the ORed
    # accumulation gets re-shifted (overflow)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * n + j})"
        for j, c in enumerate(cols)
        for b in range(width)
    ]
    return "(" + " | ".join(terms) + ")"


def rank_expr(col: str, lo: str, hi: str, width: int = 16) -> Column:
    """Quantize ``col`` into [0, 2^width) over broadcast bounds columns
    ``lo``/``hi`` (degenerate ranges rank to 0)."""
    buckets = (1 << width) - 1
    return F.expr(
        f"CASE WHEN {hi} <= {lo} THEN CAST(0 AS BIGINT) ELSE "
        f"CAST(least(CAST({buckets} AS DOUBLE), floor("
        f"(CAST({col} AS DOUBLE) - CAST({lo} AS DOUBLE)) / "
        f"(CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE)) * {buckets + 1})) AS BIGINT) END"
    )


def zorder_key(
    df: DataFrame, cols: list[str], width: int = 16
) -> DataFrame:
    """Attach ``__zkey`` — the Morton interleave of the columns' ranked
    bit spaces. Bounds are a broadcast 1-row aggregate; everything else
    is in-row algebra (zero extra shuffles)."""
    bounds = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    )
    ranked = df.crossJoin(F.broadcast(bounds))
    rank_cols = [
        rank_expr(c, f"__lo_{c}", f"__hi_{c}", width).alias(f"__r_{c}")
        for c in cols
    ]
    staged = ranked.select("*", *rank_cols)
    return staged.withColumn(
        "__zkey", morton_expr([f"__r_{c}" for c in cols], width)
    ).drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols],
           *[f"__r_{c}" for c in cols])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    width: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``:
    range-partition + in-partition sort by the Morton key, then drop it.
    Row groups come out as tight hyper-rectangles in every clustered
    column — verified against real parquet footer stats in tests."""
    keyed = zorder_key(df, cols, width)
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
