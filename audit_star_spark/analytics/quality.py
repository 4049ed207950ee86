"""Corpus-quality operators over the ``documents`` table (north-star
layer): Gopher-style repetition signals, rule-based quality gating,
PII scanning/redaction, and character-entropy scoring.

These are the filters a pretraining-data pipeline runs between raw crawl
and tokenization (Rae et al. 2021 "Scaling Language Models" §A.1.1 for the
repetition/quality rules; public Dolma/RefinedWeb pipelines for the PII
pass). Everything is built-in expression algebra + explode/groupBy — the
distributed shape is per-document aggregation, which shuffles on doc_id
(or (doc_id, gram)) only: no cross-document joins anywhere, so each stage
partitions freely and survives any corpus size.

Deviation from Gopher's exact definitions, chosen for single-pass
determinism (documented so the oracle can mirror it 1:1): "top n-gram
character fraction" is max over grams of count*length(gram) / total gram
chars — the most *char-massive* repeated gram — rather than the fraction
covered by the most *frequent* gram (whose tie-break across equal-count
grams is engine-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.text import STOPWORDS, TOKENS_EXPR, _stopword_pattern
from audit_star_spark.util import spread

# n-gram sizes for the repetition sweep: unigram mode, bigram mode, and
# duplicate-trigram mass (Gopher uses 2..4 for "top" and 5..10 for "dup";
# one representative of each family keeps the pivot narrow)
REP_NGRAMS = (1, 2, 3)


def _all_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, n, gram) rows for every n in REP_NGRAMS from ONE scan and
    ONE explode: the per-doc gram streams are built as arrays of (n, gram)
    structs and concatenated in-row, so the corpus is tokenized once (a
    3-stream union form re-ran regexp+split per n). Gram enumeration uses
    a 0-based sequence index over the token array — the oracle's DuckDB
    mirror shifts by one for 1-based lists."""

    def stream(n: int) -> str:
        if n == 1:
            return "transform(__t, g -> struct(1 AS n, g AS gram))"
        joined = " || ' ' || ".join(f"__t[__i + {j}]" for j in range(n))
        return (
            f"CASE WHEN size(__t) >= {n} THEN "
            f"transform(sequence(0, size(__t) - {n}), "
            f"__i -> struct({n} AS n, {joined} AS gram)) "
            f"ELSE array() END"
        )

    concat = "concat(" + ", ".join(stream(n) for n in REP_NGRAMS) + ")"
    return (
        spread(docs).select("doc_id", F.expr(TOKENS_EXPR).alias("__t"))
        .select("doc_id", F.explode(F.expr(concat)).alias("__g"))
        .select("doc_id", F.col("__g.n").alias("n"), F.col("__g.gram").alias("gram"))
    )


def with_repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals:

    - ``n_tokens``, ``distinct_token_ratio`` (type-token ratio);
    - ``top_1gram_char_frac`` / ``top_2gram_char_frac``: char mass of the
      heaviest repeated uni/bigram over total gram char mass;
    - ``dup_3gram_char_frac``: fraction of trigram char mass in trigrams
      occurring more than once.

    Shape: union of gram streams -> hash aggregate on (doc_id, n, gram)
    (map-side combine collapses repeats before the shuffle) -> conditional
    aggregate to one row per doc. Two shuffles, both keyed by doc_id.
    """
    counts = _all_grams(docs).groupBy("doc_id", "n", "gram").agg(
        F.count("*").alias("cnt")
    )
    mass = (F.col("cnt") * F.length("gram")).cast("double")

    def for_n(n: int, col: F.Column) -> F.Column:
        return F.max(F.when(F.col("n") == n, col))

    def sum_n(n: int, col: F.Column) -> F.Column:
        return F.sum(F.when(F.col("n") == n, col))

    per_doc = counts.groupBy("doc_id").agg(
        sum_n(1, F.col("cnt")).cast("long").alias("n_tokens"),
        F.count(F.when(F.col("n") == 1, True)).cast("long").alias("n_distinct_tokens"),
        (for_n(1, mass) / sum_n(1, mass)).alias("top_1gram_char_frac"),
        (for_n(2, mass) / sum_n(2, mass)).alias("top_2gram_char_frac"),
        (
            F.coalesce(sum_n(3, F.when(F.col("cnt") > 1, mass)), F.lit(0.0))
            / sum_n(3, mass)
        ).alias("dup_3gram_char_frac"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        (F.col("n_distinct_tokens").cast("double") / F.col("n_tokens")).alias(
            "distinct_token_ratio"
        ),
        "top_1gram_char_frac",
        "top_2gram_char_frac",
        "dup_3gram_char_frac",
    )


# quality-gate thresholds — tuned so the synthetic corpus splits
# non-trivially (documents run 20..120 tokens with heavy repetition)
MIN_TOKENS = 25
MAX_TOKENS = 100_000
MIN_AVG_TOK = 2.0
MAX_AVG_TOK = 12.0
MIN_DISTINCT_RATIO = 0.30
MAX_TOP_2GRAM = 0.20
MIN_STOPWORD_HITS = 1


def gopher_quality_flags(docs: DataFrame) -> DataFrame:
    """Rule-based keep/drop gate: each rule is a boolean column; ``keep``
    is their conjunction. Joins the repetition stats (doc_id-keyed, so the
    join co-partitions with the aggregation above) with in-row length and
    stopword signals — one pass over the corpus plus the repetition
    aggregate, no cross-document state."""
    rep = with_repetition_stats(docs)
    toks = F.expr(TOKENS_EXPR)
    tok_chars = F.expr(f"aggregate({TOKENS_EXPR}, 0, (a, t) -> a + length(t))")
    base = spread(docs).select(
        "doc_id",
        F.size(toks).alias("__nt"),
        (tok_chars.cast("double") / F.size(toks)).alias("__avg"),
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{_stopword_pattern(STOPWORDS)}', 0)")
        ).alias("__stop"),
    )
    j = base.join(rep, "doc_id")
    flags = {
        "ok_length": (F.col("__nt") >= MIN_TOKENS) & (F.col("__nt") <= MAX_TOKENS),
        "ok_avg_token_len": (F.col("__avg") >= MIN_AVG_TOK) & (F.col("__avg") <= MAX_AVG_TOK),
        "ok_stopwords": F.col("__stop") >= MIN_STOPWORD_HITS,
        "ok_diversity": F.col("distinct_token_ratio") >= MIN_DISTINCT_RATIO,
        "ok_repetition": F.col("top_2gram_char_frac") <= MAX_TOP_2GRAM,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return j.select(
        "doc_id",
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )


# Deterministic PII injection for testability: the synthetic corpus has no
# PII, so the scan's gate query plants spans keyed off doc_id (mirrored
# verbatim in the oracle). The operator itself takes any text column.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = r"\\(\\d{3}\\) \\d{3}-\\d{4}"
PII_IPV4 = r"\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"


def with_pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII counts and a redacted text: emails, US-style
    phone numbers, IPv4 literals. Pure regexp algebra (Java regex on the
    Spark side, RE2 in the oracle — the patterns use only the common
    subset: classes, bounded repeats, word boundaries, no backrefs)."""
    t = F.col(text_col)

    def n(pat: str) -> F.Column:
        return F.size(F.expr(f"regexp_extract_all({text_col}, '{pat}', 0)"))

    redacted = t
    for pat, tag in ((PII_EMAIL, "<EMAIL>"), (PII_PHONE, "<PHONE>"), (PII_IPV4, "<IP>")):
        redacted = F.regexp_replace(redacted, pat.replace("\\\\", "\\"), tag)
    n_email, n_phone, n_ip = n(PII_EMAIL), n(PII_PHONE), n(PII_IPV4)
    return spread(docs).select(
        "doc_id",
        n_email.cast("long").alias("n_emails"),
        n_phone.cast("long").alias("n_phones"),
        n_ip.cast("long").alias("n_ips"),
        (n_email + n_phone + n_ip).cast("long").alias("n_pii"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


def with_char_entropy(docs: DataFrame) -> DataFrame:
    """Character-unigram Shannon entropy per document (nats):
    H = ln(n) - sum(cnt * ln(cnt)) / n — a cheap gibberish/compression
    proxy (near-zero entropy = one repeated char; high entropy = diverse
    byte soup). Shape: explode positions -> (doc_id, ch) hash aggregate ->
    doc_id aggregate; both shuffles keyed by doc_id."""
    chars = spread(docs).select(
        "doc_id",
        F.expr("explode(sequence(1, length(text)))").alias("__i"),
        F.col("text"),
    ).select("doc_id", F.expr("substr(text, __i, 1)").alias("ch"))
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("cnt"))
    # the sum(cnt*ln cnt) folds over the SORTED count array: float addition
    # is order-sensitive at the last ulp and hash-aggregate order is
    # engine/partitioning-dependent — sorting first makes the reduction
    # bit-identical on any engine at any parallelism
    m = F.expr(
        "aggregate(array_sort(collect_list(cnt)), CAST(0.0 AS DOUBLE), "
        "(s, c) -> s + CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))"
    )
    # round to 12 decimals: JVM Math.log and C libm log() may differ in the
    # last ulp for the same input — the one cross-engine nondeterminism a
    # sorted fold cannot remove
    return counts.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_chars"),
        F.round(
            F.log(F.sum("cnt").cast("double")) - m / F.sum("cnt").cast("double"), 12
        ).alias("char_entropy"),
    )


def streaming_quality_gate(docs_stream: DataFrame, out_path: str, checkpoint: str):
    """Streaming corpus-ingest quality gate: per micro-batch, score every
    arriving document with ``gopher_quality_flags`` and append only keepers.

    foreachBatch is the right stateful shape here BECAUSE the gate is
    per-document: every signal (length, repetition, stopwords) is a
    function of one row, so batch-local evaluation is exact — no
    cross-batch aggregation state, no watermark, and restart safety comes
    from the checkpointed batch id (a replayed batch overwrites append
    idempotently at the sink's dedup level or is simply re-filtered to the
    same rows). At scale each micro-batch is an independent bounded job —
    the same plan the batch gate runs.
    """

    def on_batch(batch_df: DataFrame, _batch_id: int) -> None:
        keep_ids = gopher_quality_flags(batch_df).filter(F.col("keep")).select("doc_id")
        batch_df.join(keep_ids, "doc_id").write.mode("append").parquet(out_path)

    return (
        docs_stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
