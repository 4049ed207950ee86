"""Parquet footer introspection: row-group statistics as a DataFrame.

The data-skipping story (sorted log layout, Z-order clustering, sparse
anchors) rests on parquet row-group min/max stats — this operator makes
them queryable, the ops tool that answers "WILL this predicate prune?"
without running it: one row per (file, row group, column) with min/max/
null-count/size, read from footers only (never the data pages).

Distributed shape: footers are read per-file inside mapInPandas over the
binaryFile file LIST (content is dropped before the parse — only paths
ship), so 100k files fan across executors and each task does metadata-
sized I/O. pyarrow is bundled with pyspark, so this stays in the
permitted dependency set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FOOTER_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("row_group", T.IntegerType()),
        T.StructField("column", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_nulls", T.LongType()),
        T.StructField("min_value", T.StringType()),
        T.StructField("max_value", T.StringType()),
        T.StructField("compressed_bytes", T.LongType()),
    ]
)


def parquet_footer_stats(spark: SparkSession, path: str) -> DataFrame:
    """One row per (file, row group, column) of every parquet file under
    ``path``. min/max are stringified (schema-stable across column
    types); columns without statistics yield NULL min/max."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
        .select("path")
    )

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                local = p[len("file:") :] if p.startswith("file:") else p
                try:
                    md = pq.ParquetFile(local).metadata
                except Exception:
                    continue  # unreadable file: skip, don't kill the task
                names = [md.schema.column(i).name for i in range(md.num_columns)]
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci, name in enumerate(names):
                        col = g.column(ci)
                        st = col.statistics
                        rows.append(
                            {
                                "file": p,
                                "row_group": rg,
                                "column": name,
                                "n_rows": g.num_rows,
                                "n_nulls": st.null_count if st else None,
                                "min_value": str(st.min) if st and st.has_min_max else None,
                                "max_value": str(st.max) if st and st.has_min_max else None,
                                "compressed_bytes": col.total_compressed_size,
                            }
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FOOTER_SCHEMA.fields]
            )

    return files.mapInPandas(read_footers, FOOTER_SCHEMA)


def pruning_estimate(
    stats: DataFrame, column: str, lo, hi
) -> DataFrame:
    """Given :func:`parquet_footer_stats` output for a NUMERIC column,
    estimate what a range predicate ``lo <= col <= hi`` would scan: one
    row with total/survivor row-group counts and row sums. Casts the
    stringified stats back to double — callers pick columns where that
    is lossless (ints, floats, decimals)."""
    c = stats.filter(F.col("column") == column).select(
        "file",
        "row_group",
        "n_rows",
        F.col("min_value").cast("double").alias("mn"),
        F.col("max_value").cast("double").alias("mx"),
    )
    hit = (F.col("mn") <= F.lit(float(hi))) & (F.col("mx") >= F.lit(float(lo)))
    return c.agg(
        F.count("*").cast("long").alias("total_groups"),
        F.sum(hit.cast("long")).cast("long").alias("hit_groups"),
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("hit_rows"),
    )
