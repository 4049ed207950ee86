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

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.text import STOPWORDS, TOKENS_EXPR, _stopword_pattern
from audit_star_spark.util import spread

# n-gram sizes for the repetition sweep: unigram mode, bigram mode, and
# duplicate-trigram mass (Gopher uses 2..4 for "top" and 5..10 for "dup";
# one representative of each family keeps the pivot narrow)
REP_NGRAMS = (1, 2, 3)


def _gram_arr(n: int) -> str:
    """n-gram array over the staged token array ``__t`` (0-based Spark
    indexing; the oracle's DuckDB mirror shifts by one for 1-based
    lists). Empty array when the doc has fewer than n tokens."""
    if n == 1:
        return "__t"
    joined = " || ' ' || ".join(f"__t[__i + {j}]" for j in range(n))
    return (
        f"CASE WHEN size(__t) >= {n} THEN "
        f"transform(sequence(0, size(__t) - {n}), __i -> {joined}) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def _run_starts(gs: str) -> str:
    """1-based run-start positions of a SORTED gram array ``gs`` (position
    i starts a run iff i = 1 or gs[i] != gs[i-1]).

    The i = 1 case is guarded with greatest(i-1, 1) instead of relying on
    OR short-circuit: Spark's element_at raises on index 0."""
    return (
        f"CASE WHEN size({gs}) = 0 THEN CAST(array() AS array<int>) ELSE "
        f"filter(sequence(1, size({gs})), "
        f"i -> i = 1 OR NOT (element_at({gs}, i) = element_at({gs}, greatest(i - 1, 1)))) END"
    )


def _top(n: int) -> F.Column:
    return F.expr(f"array_max(transform(__runs{n}, x -> x.m))")


def _total(n: int) -> F.Column:
    return F.expr(f"aggregate(__runs{n}, CAST(0 AS BIGINT), (a, x) -> a + x.m)")


def _dup(n: int) -> F.Column:
    return F.expr(
        f"aggregate(__runs{n}, CAST(0 AS BIGINT), "
        f"(a, x) -> a + CASE WHEN x.r > 1 THEN x.m ELSE CAST(0 AS BIGINT) END)"
    )


def _frac(num: F.Column, den: F.Column) -> F.Column:
    # nullif: an empty gram array must yield NULL, not 0/0 = NaN
    # (engines disagree on float-NaN vs NULL under hashing)
    return num.cast("double") / F.nullif(den, F.lit(0)).cast("double")


def _rep_chain(docs: DataFrame, extra: dict[str, F.Column] | None = None) -> DataFrame:
    """Staged per-document chain ending in doc_id, n_tokens,
    n_distinct_tokens and ``__runs{n}`` run arrays (per run: char mass m =
    r*len(gram), multiplicity r), plus any ``extra`` columns computed off
    the raw document row in the first projection.

    Intermediates (sorted gram arrays, run-start positions) are staged as
    columns across selects: inlining them re-evaluates the sort per lambda
    access (the ARCHITECTURE.md withColumn/inline lesson)."""
    extra = extra or {}
    carry = list(extra)
    s1 = spread(docs).select(
        "doc_id",
        F.expr(TOKENS_EXPR).alias("__t"),
        *[c.alias(k) for k, c in extra.items()],
    )
    head = ["doc_id", "n_tokens", "n_distinct_tokens", *carry]
    s2 = s1.select(
        "doc_id",
        F.size("__t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("__t")).cast("long").alias("n_distinct_tokens"),
        *carry,
        *[F.expr(f"array_sort({_gram_arr(n)})").alias(f"__gs{n}") for n in REP_NGRAMS],
    )
    s3 = s2.select(
        *head,
        *[F.col(f"__gs{n}") for n in REP_NGRAMS],
        *[F.expr(_run_starts(f"__gs{n}")).alias(f"__st{n}") for n in REP_NGRAMS],
    )
    # per run: multiplicity r = next_start - start; char mass = r * len(gram)
    return s3.select(
        *head,
        *[
            F.expr(
                f"zip_with(__st{n}, "
                f"concat(slice(__st{n}, 2, size(__st{n}) - 1), array(size(__gs{n}) + 1)), "
                f"(s, e) -> named_struct("
                f"'m', CAST((e - s) * length(element_at(__gs{n}, s)) AS BIGINT), "
                f"'r', CAST(e - s AS BIGINT)))"
            ).alias(f"__runs{n}")
            for n in REP_NGRAMS
        ],
    )


def with_repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals:

    - ``n_tokens``, ``distinct_token_ratio`` (type-token ratio);
    - ``top_1gram_char_frac`` / ``top_2gram_char_frac``: char mass of the
      heaviest repeated uni/bigram over total gram char mass;
    - ``dup_3gram_char_frac``: fraction of trigram char mass in trigrams
      occurring more than once.

    Shape: ZERO shuffles. The statistics are per-document, so nothing may
    leave the row: sort each gram array in-row, derive run-length char
    masses with pure integer algebra, and reduce those. An earlier
    explode -> (doc_id, n, gram) hash-aggregate shape was correct but
    shuffled the whole gram stream to compute a row-local quantity; this
    one scans, projects, and is embarrassingly parallel at any corpus
    size. All masses are exact BIGINTs — floats appear only in the final
    ratios, so no summation-order issues exist."""
    chain = _rep_chain(docs)
    return chain.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        _frac(F.col("n_distinct_tokens"), F.col("n_tokens")).alias(
            "distinct_token_ratio"
        ),
        _frac(_top(1), _total(1)).alias("top_1gram_char_frac"),
        _frac(_top(2), _total(2)).alias("top_2gram_char_frac"),
        _frac(_dup(3), _total(3)).alias("dup_3gram_char_frac"),
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
    is their conjunction. Every signal — length, average token length,
    stopword presence, diversity, repetition — is a function of ONE
    document row, so the whole gate is a single zero-shuffle projection
    over the shared repetition chain (an earlier version joined two
    scans of the corpus on doc_id; a per-row gate must not join)."""
    chain = _rep_chain(
        docs,
        extra={
            "__avg": (
                F.expr(
                    f"aggregate({TOKENS_EXPR}, 0, (a, t) -> a + length(t))"
                ).cast("double")
                / F.size(F.expr(TOKENS_EXPR))
            ),
            "__stop": F.size(
                F.expr(
                    f"regexp_extract_all(lower(text), '{_stopword_pattern(STOPWORDS)}', 0)"
                )
            ),
        },
    )
    staged = chain.select(
        "doc_id",
        "n_tokens",
        "__avg",
        "__stop",
        _frac(F.col("n_distinct_tokens"), F.col("n_tokens")).alias("__div"),
        _frac(_top(2), _total(2)).alias("__top2"),
    )
    flags = {
        "ok_length": (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_tokens") <= MAX_TOKENS),
        "ok_avg_token_len": (F.col("__avg") >= MIN_AVG_TOK)
        & (F.col("__avg") <= MAX_AVG_TOK),
        "ok_stopwords": F.col("__stop") >= MIN_STOPWORD_HITS,
        "ok_diversity": F.col("__div") >= MIN_DISTINCT_RATIO,
        "ok_repetition": F.col("__top2") <= MAX_TOP_2GRAM,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return staged.select(
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
    # guard the explode: Spark's sequence(1, 0) yields the DESCENDING
    # [1, 0] (a phantom 2-row expansion for empty text) while the oracle's
    # generate_series(1, 0) is empty — empty docs must emit no row on
    # either engine
    chars = spread(docs).select(
        "doc_id",
        F.expr(
            "explode(CASE WHEN length(text) > 0 "
            "THEN sequence(1, length(text)) ELSE array() END)"
        ).alias("__i"),
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
    cross-batch aggregation state, no watermark. At scale each micro-batch
    is an independent bounded job — the same plan the batch gate runs.

    Exactly-once despite foreachBatch's at-least-once replay contract:
    the sink partitions by ``ingest_batch_id`` and writes with DYNAMIC
    partition overwrite, so a micro-batch replayed after a crash (data
    write landed, checkpoint commit did not) rewrites exactly its own
    partition instead of appending duplicates. A plain ``mode("append")``
    parquet sink would silently double every keeper row on replay.
    """

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        _gate_batch(batch_df, batch_id, out_path)

    return (
        docs_stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _gate_batch(batch_df: DataFrame, batch_id: int, out_path: str) -> None:
    """One idempotent micro-batch of the streaming quality gate (exposed
    for direct replay testing)."""
    # persist the slim verdict BEFORE filtering on keep: predicate
    # pushdown through the staged quality chain re-inlines the tokenizer
    # ~177x into one interpreted scan filter (measured 372s for 200 docs
    # in the corpus pipeline) — the cache is the pushdown barrier
    flags = gopher_quality_flags(batch_df).select("doc_id", "keep").persist()
    keep_ids = flags.filter(F.col("keep")).select("doc_id")
    (
        batch_df.join(keep_ids, "doc_id")
        .withColumn("ingest_batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch_id")
        .parquet(out_path)
    )
    flags.unpersist()


COMPRESSION_SCHEMA_FIELDS = "doc_id long, n_raw_bytes long, n_zlib_bytes long, zlib_ratio double, bits_per_char double"


def compression_ratio(docs: DataFrame, level: int = 6) -> DataFrame:
    """Per-document zlib compressibility — the Gopher/Dolma-family
    quality heuristic: machine-generated or highly repetitive text
    compresses far below natural language (~0.3-0.5 at level 6), while
    random noise approaches 1.0. Emits raw/compressed byte counts, the
    ratio, and bits-per-character.

    Arrow-batched mapInPandas (zlib is stdlib; no SQL-expressible
    equivalent exists in DuckDB, so this operator is locked by a
    semantic pytest — monotonicity on known-compressibility corpora and
    run-to-run determinism — rather than a value oracle). Narrow
    execution, no shuffle."""
    import pandas as pd  # noqa: F401

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_raw_bytes", T.LongType()),
            T.StructField("n_zlib_bytes", T.LongType()),
            T.StructField("zlib_ratio", T.DoubleType()),
            T.StructField("bits_per_char", T.DoubleType()),
        ]
    )

    def run(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            ids, raws, comps, ratios, bpcs = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "").encode("utf-8")
                comp = zlib.compress(raw, level)
                ids.append(int(doc_id))
                raws.append(len(raw))
                comps.append(len(comp))
                ratios.append(round(len(comp) / len(raw), 9) if raw else None)
                bpcs.append(
                    round(8.0 * len(comp) / len(text), 9) if text else None
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_raw_bytes": pd.Series(raws, dtype="int64"),
                    "n_zlib_bytes": pd.Series(comps, dtype="int64"),
                    "zlib_ratio": pd.Series(ratios, dtype="float64"),
                    "bits_per_char": pd.Series(bpcs, dtype="float64"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(run, schema=schema)


# --------------------------------------------------------- C4 line cleaner
# Raffel et al. 2020 (arXiv:1910.10683) §2.2 — the C4 structural rules
# between raw extraction and dedup: keep only lines that end in a
# terminal punctuation mark, carry enough words, and do not contain the
# word "javascript"; drop the whole page when fewer than `min_lines`
# lines survive, or when it contains a blocklisted phrase
# ("lorem ipsum") or a curly brace (the code-leak tell). Everything is
# ONE in-row expression chain per page — no explode, no shuffle, the
# cleaner is a pure map over the corpus scan (the cheapest possible
# 100 TB shape).

C4_TERMINAL = (".", "!", "?", '"')
C4_BLOCKLIST = ("lorem ipsum", "{")
C4_LINE_BLOCKWORD = "javascript"


def c4_line_clean(
    pages: DataFrame,
    text_col: str = "page",
    min_words_per_line: int = 5,
    min_lines: int = 5,
    blocklist: tuple = C4_BLOCKLIST,
) -> DataFrame:
    """Per-page C4 report: (doc_id, n_lines, n_kept_lines, kept,
    drop_reason, clean_md5). ``kept`` pages carry the md5 of the
    rewritten text (surviving lines re-joined with a newline);
    dropped pages report which rule fired first — 'blocklist' wins
    over 'too_few_lines' (C4 applies the page-level filters to the
    raw page). Line word counts split on runs of whitespace after
    trimming; a trailing-whitespace line still matches its terminal
    punctuation (rtrim before the suffix test), matching the published
    intent rather than a byte-literal reading.

    Parameter provenance (the paper text and the released c4_utils
    disagree; defaults follow the RELEASED implementation):

    - ``min_words_per_line=5``: §2.2 prose says "at least 3 words",
      but the official c4_utils ships MIN_WORDS_PER_LINE = 5. Pass 3
      for the paper-text reading.
    - ``min_lines=5``: §2.2 "removed any page with fewer than 5
      sentences" (c4_utils MIN_NUM_SENTENCES = 5), with surviving
      lines standing in for sentences here.
    - the §2.2 "removed any line with the word Javascript" rule IS
      implemented: a line containing :data:`C4_LINE_BLOCKWORD`
      (case-insensitive) is dropped at line level, like c4_utils.

    Blocklist phrases may contain any characters (they are matched as
    plain case-insensitive substrings via column ops, never spliced
    into SQL text); ``text_col`` must be a plain identifier because it
    is referenced inside an ``F.expr`` lambda chain."""
    if min_words_per_line < 1 or min_lines < 1:
        raise ValueError("min_words_per_line and min_lines must be >= 1")
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", text_col):
        raise ValueError(f"text_col must be a plain identifier: {text_col!r}")
    term = ", ".join(f"'{t}'" if t != '"' else "'\"'" for t in C4_TERMINAL)
    keep_line = (
        f"size(split(trim(l), '\\\\s+')) >= {min_words_per_line} "
        f"AND array_contains(array({term}), substring(rtrim(l), -1, 1)) "
        f"AND NOT contains(lower(l), '{C4_LINE_BLOCKWORD}')"
    )
    kept_lines = f"filter(split({text_col}, '\\n'), l -> {keep_line})"
    block = F.lit(False)
    for p in blocklist:
        block = block | F.contains(F.lower(F.col(text_col)), F.lit(p.lower()))
    return pages.select(
        "doc_id",
        F.expr(f"size(split({text_col}, '\\n'))").cast("long").alias("n_lines"),
        F.expr(f"size({kept_lines})").cast("long").alias("n_kept_lines"),
        block.alias("__blocked"),
        F.md5(F.expr(f"array_join({kept_lines}, '\\n')")).alias("__md5"),
    ).select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        (~F.col("__blocked") & (F.col("n_kept_lines") >= min_lines)).alias(
            "kept"
        ),
        F.when(F.col("__blocked"), F.lit("blocklist"))
        .when(F.col("n_kept_lines") < min_lines, F.lit("too_few_lines"))
        .otherwise(F.lit(None).cast("string"))
        .alias("drop_reason"),
        F.when(
            ~F.col("__blocked") & (F.col("n_kept_lines") >= min_lines),
            F.col("__md5"),
        ).alias("clean_md5"),
    )
