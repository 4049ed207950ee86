"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm), the classic LOCAL fingerprint selection with a matching
guarantee the repo's other dedup primitives don't give:

- k-gram hashes: the polynomial rolling hash of every k consecutive
  token hashes (same FP_PRIME / md5-60-bit family as
  text.with_fingerprint, so equal token runs hash equally);
- window selection: over every w consecutive k-gram hashes, keep the
  MINIMUM, breaking ties by the RIGHTMOST position (the paper's robust
  winnowing rule); the distinct (position, hash) selections are the
  document's fingerprints.

GUARANTEE (paper Thm. 2): any shared token run of length >= w + k - 1
produces at least one shared fingerprint hash, and no run shorter than
k is ever detected — tunable recall with ~2/(w+1) selection density,
far sparser than all-shingles Jaccard.

100 TB shape: k-gram hashing AND window selection are ONE in-row
expression per document (no explode until the final fingerprint set),
so the corpus scan emits ~2n/(w+1) fingerprint rows per n-token doc.
Pair detection is the standard inverted-index bucket join on the
fingerprint hash; ``max_doc_freq`` (opt-in) drops fingerprints shared
by more than that many documents — MOSS's "ignore ubiquitous
fingerprints" rule, which is ALSO the quadratic-bucket skew guard
(a boilerplate k-gram in 10^5 docs would otherwise emit 10^10 candidate
pairs). Documents shorter than k tokens have no fingerprints; shorter
than w + k - 1, the single window is the whole k-gram list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.text import FP_PRIME, TOK_HASHES_EXPR
from audit_star_spark.plans.iterate import iter_materialize

WIN_K = 4  # k-gram length (tokens)
WIN_W = 4  # winnowing window (k-grams)


def _kgram_expr(k: int, th: str = "th") -> str:
    """In-row k-gram rolling hashes over a token-hash array column."""
    return (
        f"CASE WHEN size({th}) >= {k} THEN "
        f"transform(sequence(0, size({th}) - {k}), i -> "
        f"aggregate(slice({th}, i + 1, {k}), CAST(0 AS BIGINT), "
        f"(h, t) -> (h * 31 + t % {FP_PRIME}) % {FP_PRIME})) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )


def _select_expr(w: int, kg: str = "kg") -> str:
    """In-row winnowing selection: per window, the minimum k-gram hash
    with rightmost tie-break; distinct (pos, fp) structs."""
    n_win = (
        f"CASE WHEN size({kg}) >= {w} THEN size({kg}) - {w} + 1 "
        f"WHEN size({kg}) >= 1 THEN 1 ELSE 0 END"
    )
    pick = (
        f"aggregate(sequence(s, least(s + {w} - 1, size({kg}))), "
        f"named_struct('pos', CAST(0 AS INT), 'fp', CAST(-1 AS BIGINT)), "
        f"(st, j) -> CASE WHEN st.fp < 0 OR element_at({kg}, j) <= st.fp "
        f"THEN named_struct('pos', CAST(j AS INT), "
        f"'fp', element_at({kg}, j)) ELSE st END)"
    )
    # sequence(1, 0) DESCENDS in Spark, so the no-k-gram case (docs
    # shorter than k tokens) must short-circuit to an empty selection
    return (
        f"CASE WHEN size({kg}) = 0 THEN "
        f"CAST(array() AS ARRAY<STRUCT<pos: INT, fp: BIGINT>>) "
        f"ELSE array_distinct(transform(sequence(1, {n_win}), s -> {pick})) "
        f"END"
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = WIN_K, w: int = WIN_W
) -> DataFrame:
    """(doc_id, pos, fp): the winnowed fingerprint set of each document
    — pos is the 1-based k-gram index the hash was selected at (the
    paper keeps positions for match localization)."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    sel = (
        docs.select("doc_id", F.expr(TOK_HASHES_EXPR).alias("th"))
        .select("doc_id", F.expr(_kgram_expr(k)).alias("kg"))
        .select("doc_id", F.explode(F.expr(_select_expr(w))).alias("s"))
    )
    return sel.select(
        "doc_id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp")
    )


def winnow_near_pairs(
    docs: DataFrame,
    k: int = WIN_K,
    w: int = WIN_W,
    min_shared: int = 2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, n_shared, overlap): document pairs sharing at
    least ``min_shared`` distinct fingerprint hashes; overlap =
    n_shared / min(|fp_a|, |fp_b|) (the containment-style score — 1.0
    when the smaller document's fingerprints all reappear).

    ``max_doc_freq`` drops fingerprints present in more than that many
    documents BEFORE the self-join (MOSS's ubiquity rule / the skew
    guard); sizes are computed before the drop so overlap stays
    comparable across cap settings. Default None = exact semantics,
    required by the gate oracle."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    fph = winnow_fingerprints(docs, k, w).select("doc_id", "fp").distinct()
    # materialize: the sizes aggregate, the (optional) ubiquity stats
    # and the two sides of the bucket join all read this md5-heavy
    # frame. localCheckpoint, not persist: blocks release when the
    # result frame is unreferenced instead of pinning cache for the
    # session's life (the release_kn_model lifetime rule).
    fph = iter_materialize(fph)
    sizes = fph.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    buckets = fph
    if max_doc_freq is not None:
        freq = fph.groupBy("fp").agg(F.count("*").alias("__df"))
        buckets = (
            fph.join(freq, "fp")
            .filter(F.col("__df") <= max_doc_freq)
            .drop("__df")
        )
    a, b = buckets.alias("a"), buckets.alias("b")
    shared = (
        a.join(b, F.col("a.fp") == F.col("b.fp"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            (F.col("n_shared") / F.least("na", "nb")).alias("overlap"),
        )
    )
