"""Re-identification risk census over structured tables: k-anonymity
(Sweeney 2002, "k-anonymity: a model for protecting privacy") and
l-diversity (Machanavajjhala et al. 2007) — the standard privacy audit a
compliance pipeline runs over structured training data before release.

An equivalence class is the set of rows sharing the quasi-identifier
tuple; a dataset is k-anonymous when every class has >= k rows, and a
class is l-diverse when its sensitive column takes >= l distinct values
(a large class with ONE sensitive value still leaks — the homogeneity
attack the paper opens with).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_census(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Census of equivalence-class sizes under ``quasi_cols``: one row
    per observed class size with

    - ``n_classes`` / ``n_rows`` — classes and rows of that size;
    - ``share6`` — fraction of all rows in classes of that size;
    - ``risky`` — whether the size violates k-anonymity (size < k);
    - ``min_l`` / ``avg_l6`` — min / mean distinct sensitive values per
      class (NULL without ``sensitive_col``): ``min_l = 1`` flags
      classes open to the homogeneity attack even when size >= k.

    Scale shape: one map-side-combined groupBy on the quasi columns
    (exact distinct of the sensitive column rides the same aggregate),
    one groupBy on the BOUNDED class-size domain, and the corpus total
    arrives as a broadcast 1-row frame (the lm.py scalar convention) —
    no window over the corpus, no single-partition exchange of data
    rows. Deterministic: integer counts; the only floats are final
    6-dp-rounded ratios of integers."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    aggs = [F.count("*").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("l"))
    classes = df.groupBy(*quasi_cols).agg(*aggs)
    return census_from_classes(classes, k, sensitive_col is not None)


def census_from_classes(
    classes: DataFrame, k: int, has_sensitive: bool
) -> DataFrame:
    """The size-census tail over a (quasi..., class_size[, l]) frame —
    shared by :func:`k_anonymity_census` and the streaming store's
    census-at-read so batch and stream cannot drift."""
    sensitive_col = "l" if has_sensitive else None
    sized = classes.groupBy("class_size").agg(
        F.count("*").alias("n_classes"),
        F.sum("class_size").alias("n_rows"),
        *(
            [
                F.min("l").alias("min_l"),
                F.round(F.avg("l"), 6).alias("avg_l6"),
            ]
            if sensitive_col is not None
            else [
                F.lit(None).cast("long").alias("min_l"),
                F.lit(None).cast("double").alias("avg_l6"),
            ]
        ),
    )
    total = sized.agg(F.sum("n_rows").alias("total_rows"))
    return (
        sized.crossJoin(F.broadcast(total))
        .select(
            "class_size",
            "n_classes",
            "n_rows",
            F.round(F.col("n_rows") / F.col("total_rows"), 6).alias("share6"),
            (F.col("class_size") < k).alias("risky"),
            "min_l",
            "avg_l6",
        )
    )
