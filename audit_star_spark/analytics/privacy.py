"""Re-identification risk census over structured tables: k-anonymity
(Sweeney 2002, "k-anonymity: a model for protecting privacy"),
l-diversity (Machanavajjhala et al. 2007), and t-closeness (Li, Li &
Venkatasubramanian 2007) — the standard privacy audits a compliance
pipeline runs over structured training data before release.

An equivalence class is the set of rows sharing the quasi-identifier
tuple; a dataset is k-anonymous when every class has >= k rows, and a
class is l-diverse when its sensitive column takes >= l distinct values
(a large class with ONE sensitive value still leaks — the homogeneity
attack the paper opens with). t-closeness sharpens l-diversity against
the SKEWNESS attack: a class whose sensitive distribution differs from
the global one leaks even with many distinct values, so each class's
Earth Mover's Distance to the global distribution must stay <= t.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def t_closeness_census(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """Per-equivalence-class t-closeness audit (Li et al. 2007 §4.2,
    ordered-distance EMD): one row per class with its size, its Earth
    Mover's Distance to the GLOBAL sensitive distribution, and whether
    it violates the ``t`` threshold. See
    :func:`t_closeness_from_counts` for the semantics and scale shape —
    this wrapper only folds the rows into per-(quasi, sensitive) counts
    (one map-side-combined aggregate), the same state the streaming
    k-anonymity store persists, so batch and stream share one tail."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    counts = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count("*").alias("n")
    )
    return t_closeness_from_counts(counts, quasi_cols, sensitive_col, t)


def t_closeness_from_counts(
    counts: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness from per-(quasi-tuple, sensitive-value) counts.

    For an ORDERED sensitive attribute with global value domain
    v_1 < ... < v_m, the paper's ordered-distance EMD between a class
    distribution p and the global distribution q is

        EMD(p, q) = (1 / (m - 1)) * sum_{i=1}^{m-1} |cum_p(i) - cum_q(i)|

    (0 when m == 1). Output: the quasi columns, ``class_size``,
    ``emd6`` (6-dp), ``violates_t`` (emd6 > t, compared AFTER rounding
    so engine and oracle can never disagree on the boundary).

    Determinism across engines: both cumulative sums stay INTEGER
    (running counts, divided by class_size / total only afterwards), so
    no float window-accumulation order can flip a hash; the one float
    reduction — the EMD sum of the |.| terms — folds in value-rank
    order (sorted-struct fold), matching the oracle's ordered list fold
    term for term.

    Scale shape: the global value frame is DOMAIN-BOUNDED (one row per
    distinct sensitive value) so its rank/cumsum window and broadcast
    are O(m); the class grid is |classes| x m rows built by a broadcast
    cross join (linear, never all-pairs); the per-class cumsum windows
    partition on the quasi tuple (bounded m rows per partition); no
    corpus-wide window, no single-partition exchange of data rows."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if not 0.0 <= t <= 1.0:
        raise ValueError(f"t must be in [0, 1], got {t}")

    # global distribution over the bounded value domain: rank, integer
    # cumulative count, total N and domain size m (tiny frame — the
    # unpartitioned window is over <= m rows, the lm.py scalar shape)
    g = counts.groupBy(sensitive_col).agg(F.sum("n").alias("gn"))
    w_dom = Window.orderBy(sensitive_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = g.agg(
        F.sum("gn").alias("n_total"), F.count("*").alias("m")
    )
    vals = (
        g.withColumn("cum_gn", F.sum("gn").over(w_dom))
        .withColumn("vrank", F.row_number().over(Window.orderBy(sensitive_col)))
        .crossJoin(F.broadcast(tot))
    )

    classes = counts.groupBy(*quasi_cols).agg(
        F.sum("n").alias("class_size")
    )
    grid = (
        classes.crossJoin(
            F.broadcast(vals.select(sensitive_col, "cum_gn", "vrank", "n_total", "m"))
        )
        .join(counts, [*quasi_cols, sensitive_col], "left")
        .withColumn("n_filled", F.coalesce(F.col("n"), F.lit(0)))
    )
    w_cls = (
        Window.partitionBy(*quasi_cols)
        .orderBy(sensitive_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    terms = grid.withColumn("cum_n", F.sum("n_filled").over(w_cls)).withColumn(
        "term",
        F.when(
            F.col("vrank") < F.col("m"),
            F.abs(
                F.col("cum_n") / F.col("class_size")
                - F.col("cum_gn") / F.col("n_total")
            ),
        ).otherwise(F.lit(0.0)),
    )
    folded = terms.groupBy(*quasi_cols).agg(
        F.first("class_size").alias("class_size"),
        F.first("m").alias("m"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("vrank", "term"))),
            F.lit(0.0),
            lambda s, x: s + x["term"],
        ).alias("emd_sum"),
    )
    return folded.select(
        *quasi_cols,
        "class_size",
        F.round(
            F.when(F.col("m") > 1, F.col("emd_sum") / (F.col("m") - 1)).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("emd6"),
    ).withColumn("violates_t", F.col("emd6") > t)
