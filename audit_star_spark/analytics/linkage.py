"""Fuzzy record linkage at edit distance 1 via symmetric-deletion
blocking (FastSS, Bocek et al. 2007 — the same neighborhood-generation
idea SymSpell popularized).

All-pairs ``levenshtein(a, b) <= 1`` is quadratic and unrunnable at
corpus scale. The FastSS observation gives exact recall with linear
candidate generation: if ``lev(s, t) <= 1`` then ``s`` and ``t`` share
an element of ``{x} ∪ del1(x)`` neighborhoods —

- equal strings share themselves;
- a substitution at position i makes ``del_i(s) = del_i(t)``;
- an insertion/deletion makes the shorter string ITSELF an element of
  the longer one's del1 set (and of its own neighborhood).

So: emit ``(variant, row)`` for the string plus each single-character
deletion (O(len) variants per row, all JVM-side ``transform`` — no
UDF), bucket-join on the variant, and verify the bounded candidate set
with the built-in ``levenshtein``. False candidates exist (two
DIFFERENT deletions can collide: del1("ax") ∩ del1("xb") ∋ "x" while
lev = 2), which is exactly why the final levenshtein filter runs; false
negatives cannot.

Scale shape: candidates are one shuffle keyed by variant; bucket sizes
are data-dependent (near-identical strings cluster) but every pair
produced shares a variant — candidate volume is O(matches + collisions),
never O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _variants_expr(col: str) -> str:
    """``{s} ∪ del1(s)`` as an array expression. Guards the empty
    string (Spark's two-arg ``sequence(1, 0)`` counts DOWN, not empty)."""
    dels = (
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substring({col}, 1, i - 1), substring({col}, i + 1)))"
    )
    return (
        f"CASE WHEN length({col}) = 0 THEN array({col}) "
        f"ELSE array_union(array({col}), {dels}) END"
    )


def _exploded(df: DataFrame, id_col: str, str_col: str, side: str) -> DataFrame:
    return (
        df.filter(F.col(str_col).isNotNull())
        .select(
            F.col(id_col).alias(f"id_{side}"),
            F.col(str_col).alias(f"s_{side}"),
            F.explode(F.expr(_variants_expr(str_col))).alias("variant"),
        )
    )


def fuzzy_link_lev1(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
) -> DataFrame:
    """Cross-relation linkage: every (left, right) pair with
    ``levenshtein <= 1`` — exact (full recall by the FastSS argument,
    no false positives after the verify filter). Returns
    ``(id_l, s_l, id_r, s_r, dist)``."""
    lv = _exploded(left, left_id, left_str, "l")
    rv = _exploded(right, right_id, right_str, "r")
    cand = (
        lv.join(rv, "variant")
        .select("id_l", "s_l", "id_r", "s_r")
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("s_l", "s_r")
    ).filter(F.col("dist") <= 1)


def fuzzy_pairs_lev1(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    """Within-relation near-duplicate pairs at edit distance <= 1,
    ``id_a < id_b`` canonical order: ``(id_a, s_a, id_b, s_b, dist)``."""
    a = _exploded(df, id_col, str_col, "a")
    b = _exploded(df, id_col, str_col, "b")
    cand = (
        a.join(b, "variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "s_a", "id_b", "s_b")
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("s_a", "s_b")
    ).filter(F.col("dist") <= 1)
