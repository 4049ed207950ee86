"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
