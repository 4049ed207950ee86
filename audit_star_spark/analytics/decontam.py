"""Corpus decontamination & boilerplate operators (north-star layer).

Two staples of a pretraining-data pipeline that aren't dedup of the corpus
against itself:

- **Benchmark contamination**: find corpus documents sharing long token
  n-grams with an evaluation/probe set (the published n-gram-overlap
  decontamination recipe — e.g. GPT-3 appendix C uses 13-grams; the n is
  a parameter here because the synthetic docs are short). Physical shape:
  the probe side is tiny by construction, so its distinct n-gram hashes
  BROADCAST and the corpus side never shuffles — one narrow scan + hash
  join + partial-aggregated count, which survives any corpus scale.
- **Boilerplate phrases**: phrases repeated across many documents
  (C4/CCNet drop lines duplicated across the corpus; these docs have no
  line structure, so the unit is a token n-gram "phrase"). Physical
  shape: explode distinct per-doc phrases, ONE hash shuffle keyed by
  phrase with map-side combine — the same df-count shape as an inverted
  index build.

Hashing: n-grams fold to 60-bit md5-derived ints before any join/shuffle
(the dedup.py convention) — string n-grams only survive inside a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.text import TOKENS_EXPR
from audit_star_spark.util import spread


def _ngram_expr(n: int, toks: str = "toks") -> str:
    """Spark SQL: distinct n-gram strings of the ``toks`` array column
    (0-based toks[i] indexing, same staging discipline as dedup._shingled:
    the array is a materialized column, never re-tokenized per element)."""
    words = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({toks}) - {n}), i -> {words})) "
        f"ELSE array() END"
    )


def _gram_hashes(docs: DataFrame, id_col: str, n: int) -> DataFrame:
    toks = spread(docs).select(
        F.col(id_col), F.expr(TOKENS_EXPR).alias("toks")
    )
    grams = toks.select(
        F.col(id_col), F.expr(_ngram_expr(n)).alias("grams")
    )
    return grams.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(grams, g -> CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT))"
            )
        ).alias("gh"),
    )


def contamination(
    docs: DataFrame, probes: DataFrame, n: int = 8, min_shared: int = 2
) -> DataFrame:
    """(doc_id, probe_id, n_shared): corpus documents sharing at least
    ``min_shared`` distinct token ``n``-grams with a probe document.

    ``probes`` has columns (probe_id, text) and is broadcast — eval sets
    are thousands of rows against a corpus of billions, so the corpus
    side must not shuffle; the count aggregates map-side first. Identical
    ids (a probe that IS the corpus doc) are excluded: self-overlap is
    total by definition."""
    d = _gram_hashes(docs, "doc_id", n)
    p = _gram_hashes(probes, "probe_id", n)
    return (
        d.join(F.broadcast(p), "gh")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .groupBy("doc_id", "probe_id")
        # distinct per side => (doc, probe, gh) rows are unique
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def boilerplate_phrases(
    docs: DataFrame, n: int = 5, min_docs: int = 3
) -> DataFrame:
    """(phrase, n_docs): token ``n``-gram phrases appearing in at least
    ``min_docs`` DISTINCT documents — the cross-document boilerplate a
    C4-style cleaner strips. Phrases stay strings here (the output is the
    phrase itself); per-doc distinctness comes from the in-row
    array_distinct, so the single shuffle's count(*) is already a
    distinct-doc count."""
    toks = spread(docs).select("doc_id", F.expr(TOKENS_EXPR).alias("toks"))
    phrases = toks.select(
        "doc_id", F.explode(F.expr(_ngram_expr(n))).alias("phrase")
    )
    return (
        phrases.groupBy("phrase")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
