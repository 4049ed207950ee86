"""Count-based n-gram language model: train + per-document perplexity.

The published data-quality recipe (CCNet, Gopher, LLaMA pipelines) scores
every candidate document with a small n-gram LM trained on trusted text
and drops the high-perplexity tail. This is that filter as pure DataFrame
algebra — a bigram model with add-k smoothing, no external toolkit:

    P(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k * V)
    nll(doc)   = -(1/n) * sum ln P(w_i | w_{i-1})      (n scored bigrams)
    ppl(doc)   = exp(nll)

Documents with fewer than 2 tokens have no scored bigrams (NULL scores —
callers treat them as their own quality class).

100 TB shape: training is two aggregations over the training corpus'
in-row bigram explode (bigram counts + unigram counts, each one shuffle,
map-side partial). Scoring joins the candidate bigram stream against the
model on the bigram key — an equi shuffle join proportional to corpus
tokens, the honest cost of exact counts; the unigram context join rides
the same bigram-keyed exchange (w1 is a prefix of the key). Unseen events
degrade smoothly through the additive smoothing: unseen bigram ->
k/(c(w1)+kV), unseen context -> 1/V.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.text import TOKENS_EXPR


def _bigrams(docs: DataFrame, tokens_expr: str) -> DataFrame:
    """(doc_id, w1, w2) — in-row adjacent pairs, zero shuffles."""
    return (
        docs.select(
            "doc_id",
            F.expr(
                f"zip_with({tokens_expr}, slice({tokens_expr}, 2, "
                f"greatest(size({tokens_expr}) - 1, 0)), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            ).alias("pairs"),
        )
        .select("doc_id", F.explode("pairs").alias("p"))
        # zip_with pads the SHORTER array with NULL (it zips to the longer
        # length), so the last pair is (w_n, NULL) — drop it
        .filter(F.col("p.w2").isNotNull())
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_lm(
    docs: DataFrame, tokens_expr: str = TOKENS_EXPR
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables of the model: (bigram_counts(w1, w2, c2),
    unigram_counts(w1, c1), vocab_stats(v) — one row, |vocab|)."""
    bg = _bigrams(docs, tokens_expr)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    toks = docs.select(F.explode(F.expr(tokens_expr)).alias("w1"))
    unigram_counts = toks.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = toks.agg(F.countDistinct("w1").alias("v"))
    return bigram_counts, unigram_counts, vocab


def doc_perplexity(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    add_k: float = 0.5,
    tokens_expr: str = TOKENS_EXPR,
) -> DataFrame:
    """Per-document perplexity under a bigram LM trained on
    ``train_docs`` (default: ``docs`` itself — the self-scored outlier
    sweep). Returns (doc_id, n_bigrams, avg_nll, perplexity); documents
    with no bigrams keep NULL avg_nll/perplexity.
    """
    if add_k <= 0:
        raise ValueError(f"add_k must be positive, got {add_k}")
    bigram_counts, unigram_counts, vocab = train_bigram_lm(
        train_docs if train_docs is not None else docs, tokens_expr
    )
    bg = _bigrams(docs, tokens_expr)
    prob = (
        bg.join(bigram_counts, ["w1", "w2"], "left")
        .join(unigram_counts, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "nll",
            -F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + add_k)
                / (F.coalesce(F.col("c1"), F.lit(0)) + add_k * F.col("v"))
            ),
        )
    )
    scores = prob.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.avg("nll").alias("avg_nll"),
    )
    # left join back so token-poor documents keep a row (NULL scores)
    return (
        docs.select("doc_id")
        .join(scores, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "avg_nll",
            F.exp("avg_nll").alias("perplexity"),
        )
    )


def perplexity_sql(
    table: str, text_col: str, add_k: float = 0.5
) -> str:
    """DuckDB mirror of :func:`doc_perplexity` (self-trained), generated
    from the same smoothing constant."""
    tok = (
        f"str_split(regexp_replace(trim(lower({text_col})), "
        "'\\s+', ' ', 'g'), ' ')"
    )
    return f"""
WITH tl AS (SELECT doc_id, {tok} AS toks FROM {table}),
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM tl, LATERAL (SELECT unnest(range(1, len(toks))) AS i)
),
bigram_counts AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
unigrams AS (SELECT doc_id, unnest(toks) AS w1 FROM tl),
unigram_counts AS (SELECT w1, count(*) AS c1 FROM unigrams GROUP BY w1),
vocab AS (SELECT count(DISTINCT w1) AS v FROM unigrams),
prob AS (
  SELECT bg.doc_id,
         -ln((coalesce(bc.c2, 0) + {add_k})
             / (coalesce(uc.c1, 0) + {add_k} * vocab.v)) AS nll
  FROM bg
  LEFT JOIN bigram_counts bc USING (w1, w2)
  LEFT JOIN unigram_counts uc USING (w1)
  CROSS JOIN vocab
),
scores AS (
  SELECT doc_id, count(*) AS n_bigrams, avg(nll) AS avg_nll
  FROM prob GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(s.n_bigrams, 0) AS n_bigrams,
       s.avg_nll,
       exp(s.avg_nll) AS perplexity
FROM {table} t LEFT JOIN scores s ON t.doc_id = s.doc_id
"""
