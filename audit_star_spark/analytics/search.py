"""Full-text retrieval over the document corpus: BM25 scoring + top-k.

The training-data loop constantly runs "find the documents most like this
query" sweeps — quality-probe retrieval, targeted decontamination, corpus
exploration. BM25 (Robertson/Spärck Jones; the Lucene-default scoring
function) is the standard lexical ranker, and it is fully expressible as
declarative DataFrame algebra — no UDFs, no index service:

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*|d|/avgdl))

100 TB shape: the expensive object — the full inverted index — is never
built, and the corpus is scanned + tokenized exactly ONCE:

  1. one scan -> per-doc slim projection (doc_id, dl, tf per query term),
     all computed in-row from the token array (no explode, no per-doc
     shuffle); lazily localCheckpointed so the two consumers below reuse
     the materialized blocks instead of re-reading the corpus;
  2. ONE 1-row aggregate over the slim rows yields every corpus
     statistic at once — N, avgdl, and the per-term document
     frequencies (sum of tf>0 indicators) — broadcast back by crossJoin
     (the established scalar-broadcast pattern, profile.py);
  3. per-doc score is a closed-form in-row expression over (tf_i, df_i,
     dl, avgdl); docs matching no term are filtered; global top-k via
     orderBy+limit, which Spark executes as TakeOrderedAndProject (no
     full sort — only k rows per partition reach the driver).

Total shuffle traffic: one 1-row aggregate. The previous design branched
the exploded token stream into `lengths` and `postings`, costing two (in
effect three) full scan+tokenize passes of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.text import TOKENS_EXPR


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    tokens_expr: str = TOKENS_EXPR,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25.

    Returns (doc_id, score, n_matched) ordered by score desc, doc_id asc
    (deterministic tie-break). Duplicate query terms are folded (set
    semantics, like Lucene's default). Documents matching no term never
    appear. ``doc_id`` must be unique per row (one document per row —
    the corpus contract everywhere else in this package).
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    # ONE tokenize pass -> slim per-doc row: length + tf per query term.
    # All in-row (whole-stage codegen); NULL-text docs drop, mirroring
    # what explode() did in the two-pass design.
    arr = F.expr(tokens_expr)

    def _tf(term: str):
        return F.size(F.filter(arr, lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)]
    # size > 0 (not just isNotNull): a caller-supplied tokens_expr may
    # yield an empty array; the explode-based oracle drops such docs
    # from `lengths`, so they must not inflate N/avgdl here either.
    slim = (
        docs.filter(arr.isNotNull() & (F.size(arr) > 0))
        .select("doc_id", F.size(arr).alias("dl"), *tf_cols)
        .localCheckpoint(eager=False)
    )

    # ONE 1-row aggregate = every corpus statistic: N, avgdl, df per term
    stats = slim.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )

    def _contrib(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
        )
        term_score = (
            idf
            * (tf * (k1 + 1))
            / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        )
        return F.when(tf > 0, term_score).otherwise(F.lit(0.0))

    score = sum((_contrib(i) for i in range(len(terms))), F.lit(0.0))
    n_matched = sum(
        ((F.col(f"tf_{i}") > 0).cast("long") for i in range(len(terms))),
        F.lit(0).cast("long"),
    )
    scored = (
        slim.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            score.alias("score"),
            n_matched.alias("n_matched"),
        )
        .filter(F.col("n_matched") > 0)
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)


def bm25_sql(
    table: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB mirror of :func:`bm25_topk` — generated from the same term
    list and constants so the oracle computes the identical function."""
    terms = sorted(set(query_terms))
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(str_split(regexp_replace(trim(lower({text_col})), '\\s+', ' ', 'g'), ' ')) AS token
  FROM {table}
),
lengths AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lengths),
postings AS (
  SELECT doc_id, token, count(*) AS tf
  FROM toks WHERE token IN ({term_list})
  GROUP BY doc_id, token
),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM postings GROUP BY token),
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (p.tf * ({k1} + 1))
           / (p.tf + {k1} * (1 - {b} + {b} * l.dl / s.avgdl))
         ) AS score,
         count(*) AS n_matched
  FROM postings p
  JOIN dfreq d USING (token)
  JOIN lengths l USING (doc_id)
  CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, score, n_matched
FROM scored
ORDER BY score DESC, doc_id
LIMIT {k}
"""
