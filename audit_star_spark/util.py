"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def qcol(name: str) -> Column:
    """Column reference robust to special characters in the NAME — dots,
    colons, spaces, uppercase, even embedded backticks.

    The Spark analog of the reference's quoted-identifier support (it
    dedicates fixtures to quoted schema/table/column/PK names,
    db/migrate/1496851823_audit_star.up.sql:95-131, audit_test.go:1122-1228).
    ``F.col`` PARSES its argument — ``a.b`` means struct access — so any
    spec-derived column name must be backtick-quoted, with embedded
    backticks doubled per Spark identifier-quoting rules.
    """
    return F.col("`" + name.replace("`", "``") + "`")


def safe_identifier(name: str) -> str:
    """Fold an arbitrary schema/table name into a legal temp-view
    identifier (Spark temp view names cannot carry quoting): non-word
    characters become ``_``. Collision-safe enough for view registries
    keyed by (schema, table); documented deviation from the reference,
    which can quote DDL identifiers."""
    import re

    return re.sub(r"[^0-9A-Za-z_]", "_", name)


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Ensure enough partitions for CPU-heavy per-row operators.

    A small parquet file arrives as ONE input split, serializing e.g. the
    per-document simhash fold onto a single core. When the scan yields
    fewer than parallelism/min_factor partitions, add a round-robin
    repartition: the shuffle moves bytes proportional to input size, which
    is negligible next to hash-heavy per-row compute — at large scale the
    scan naturally produces many splits and this becomes a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, target // min_factor):
        return df.repartition(target)
    return df
