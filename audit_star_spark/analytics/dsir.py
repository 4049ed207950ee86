"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"), the
standard pretraining-data selection recipe: score every raw document by
how much more likely its hashed n-gram profile is under a TARGET
distribution (the clean/reference corpus you want more of) than under
the RAW distribution, then resample with probability proportional to
that importance weight.

Pieces, all pure DataFrame algebra over the repo's existing idioms:

- FEATURES: hashed unigram + bigram buckets (the paper's hashed
  n-grams) — bucket id = 60-bit md5 prefix of the token (or the
  space-joined token pair) mod ``n_buckets``, the engine-portable hash
  family every dedup/split operator here uses. No vocabulary object:
  the feature map is a pure function.
- MODELS: bag-of-ngrams with add-one smoothing —
  ``p_b = (count_b + 1) / (total + n_buckets)`` — estimated once for
  the target slice and once for the raw (candidate) slice. Bucket
  counts are INTEGER sums (exact, associative — no bit-determinism
  caveat); the two count tables collapse into one ``n_buckets``-row
  log-ratio table that BROADCASTS.
- WEIGHT: ``log w(x) = sum_b c_xb * (ln p_b - ln q_b)`` — one
  broadcast join + one doc-keyed float fold (group <= distinct buckets
  per doc, bounded by document length; the fold honors ``bit_exact``
  like every float reduction, functions/folds.py).
- RESAMPLE: Gumbel top-k — key = log w + g where
  ``g = -ln(-ln(u))`` and u is the deterministic md5 uniform of
  weighted_sample (text.py): taking the top-k keys samples WITHOUT
  replacement with probability proportional to ``exp(log w)``, exactly
  the Efraimidis-Spirakis draw of weighted_sample rewritten in log
  space (ln(-ln(u^(1/w))) = ln(-ln u) - ln w is monotone), which keeps
  extreme weights finite. The top-k compiles to TakeOrderedAndProject —
  k rows per partition survive, no global sort.

100 TB shape: two corpus scans (one to count n-grams, one to score),
shuffles carry (doc_id, bucket, c) triples that partial-aggregate
map-side, the ratio table is n_buckets rows broadcast, and selection
is a top-k. Nothing grows with the corpus except the scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.text import TOKENS_EXPR
from audit_star_spark.functions.folds import fold_sum
from audit_star_spark.plans.iterate import iter_materialize

DSIR_BUCKETS = 1024


def ngram_buckets_expr(n_buckets: int, toks_col: str = "__tk") -> str:
    """In-row array of hashed n-gram bucket ids (unigrams + bigrams) —
    the DSIR feature map over an ALREADY-PROJECTED token-array column.
    The tokenizer expression must be staged into a column first:
    inlining it here would re-split the whole text inside the
    per-bigram lambda — the O(tokens^2) regex blowup the KN trigram
    stage hit (and fixed) in round 9."""
    t = toks_col
    h = "CAST(conv(substring(md5({0}), 1, 15), 16, 10) AS BIGINT) % " + str(
        n_buckets
    )
    uni = f"transform({t}, tk -> {h.format('tk')})"
    bi_tok = f"concat(element_at({t}, i), ' ', element_at({t}, i + 1))"
    # sequence(1, 0) would DESCEND in Spark, so gate the bigram list on
    # size >= 2 explicitly
    bi = (
        f"CASE WHEN size({t}) >= 2 THEN "
        f"transform(sequence(1, size({t}) - 1), i -> {h.format(bi_tok)}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    return f"concat({uni}, {bi})"


def hashed_ngram_counts(
    docs: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    tokens_expr: str = TOKENS_EXPR,
) -> DataFrame:
    """(doc_id, bucket, c): per-document hashed n-gram bucket counts —
    integer, exact, map-side combinable. Tokens are projected ONCE,
    then the gram expression runs over the materialized array."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    return (
        docs.select("doc_id", F.expr(tokens_expr).alias("__tk"))
        .select(
            "doc_id",
            F.explode(F.expr(ngram_buckets_expr(n_buckets, "__tk"))).alias(
                "bucket"
            ),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("c"))
    )


def dsir_log_ratio_table(
    counts: DataFrame,
    target_ids: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(bucket, lr): the per-bucket importance log-ratio
    ``ln p_target(b) - ln q_raw(b)`` with add-one smoothing, for EVERY
    bucket 0..n_buckets-1 (unseen buckets get the smoothed floor), so
    the scoring join never needs an outer side. ``target_ids`` is a
    (doc_id) frame naming the target slice; raw = everything else.
    n_buckets rows — broadcastable by construction."""
    spark = counts.sparkSession
    t_ids = F.broadcast(target_ids.select("doc_id").distinct())
    flagged = counts.join(
        t_ids.withColumn("__t", F.lit(1)), "doc_id", "left"
    ).select(
        "bucket", "c", F.coalesce("__t", F.lit(0)).alias("__t")
    )
    per_bucket = flagged.groupBy("bucket").agg(
        F.sum(F.when(F.col("__t") == 1, F.col("c")).otherwise(0)).alias("tc"),
        F.sum(F.when(F.col("__t") == 0, F.col("c")).otherwise(0)).alias("qc"),
    )
    totals = per_bucket.agg(
        F.sum("tc").alias("tt"), F.sum("qc").alias("qt")
    )
    all_buckets = spark.range(n_buckets).select(
        F.col("id").cast("bigint").alias("bucket")
    )
    return (
        all_buckets.join(per_bucket, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("tc", F.lit(0)) + F.lit(1.0))
                    / (F.col("tt") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.coalesce("qc", F.lit(0)) + F.lit(1.0))
                    / (F.col("qt") + F.lit(float(n_buckets)))
                )
            ).alias("lr"),
        )
    )


def log_weights_from_ratio(
    counts: DataFrame, ratio: DataFrame, bit_exact: bool = True
) -> DataFrame:
    """(doc_id, log_w) from a (doc_id, bucket, c) count frame and a
    (bucket, lr) log-ratio table — the scoring half, shared with the
    streaming count store (which derives ``ratio`` from its merged
    history instead of the scored corpus itself)."""
    return (
        counts.join(F.broadcast(ratio), "bucket")
        .select("doc_id", (F.col("c") * F.col("lr")).alias("clr"))
        .groupBy("doc_id")
        .agg(F.expr(fold_sum("clr", bit_exact)).alias("log_w"))
    )


def dsir_log_weights(
    docs: DataFrame,
    target: str,
    n_buckets: int = DSIR_BUCKETS,
    tokens_expr: str = TOKENS_EXPR,
    bit_exact: bool = True,
) -> DataFrame:
    """(doc_id, log_w) for every CANDIDATE document (those NOT matching
    the ``target`` SQL predicate): the DSIR importance log-weight under
    hashed-ngram bag models of the target vs raw slices. The per-doc
    fold honors ``bit_exact`` (group <= distinct buckets per doc)."""
    # materialize: the md5-heavy n-gram count frame feeds BOTH bag
    # models (via the ratio table) and the candidate scoring join —
    # without this the explode+hash pipeline runs twice (at real scale:
    # write the counts to storage once, as the streaming store does).
    # localCheckpoint, not persist: blocks release when the returned
    # frame is unreferenced, so repeated invocations don't pin cached
    # datasets for the session's life (the release_kn_model lifetime
    # rule, solved here without a release handle).
    counts = iter_materialize(hashed_ngram_counts(docs, n_buckets, tokens_expr))
    target_ids = docs.filter(F.expr(target)).select("doc_id")
    ratio = dsir_log_ratio_table(counts, target_ids, n_buckets)
    cand_counts = counts.join(
        F.broadcast(target_ids.withColumn("__t", F.lit(1))),
        "doc_id",
        "left",
    ).filter(F.col("__t").isNull()).select("doc_id", "bucket", "c")
    return log_weights_from_ratio(cand_counts, ratio, bit_exact)


def dsir_resample(
    docs: DataFrame,
    target: str,
    k: int,
    n_buckets: int = DSIR_BUCKETS,
    tokens_expr: str = TOKENS_EXPR,
    salt: str = "dsir",
    bit_exact: bool = True,
) -> DataFrame:
    """Select ``k`` candidate documents by Gumbel top-k over the DSIR
    importance log-weights — sampling without replacement proportional
    to exp(log_w), the paper's resampling step in the deterministic
    md5-uniform family of weighted_sample. Returns the selected docs'
    columns plus ``log_w``."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    lw = dsir_log_weights(docs, target, n_buckets, tokens_expr, bit_exact)
    u = (
        "(CAST(conv(substring(md5(CAST(doc_id AS STRING) || "
        f"':{salt}'), 1, 15), 16, 10) AS DOUBLE) + 1.0) "
        "/ 1152921504606846977.0"
    )
    key = F.col("log_w") - F.log(-F.log(F.expr(u)))
    return (
        docs.join(lw, "doc_id")
        .withColumn("__g_key", key)
        .orderBy(F.col("__g_key").desc(), F.col("doc_id"))
        .limit(k)
        .drop("__g_key")
    )
