"""Full-text retrieval over the document corpus: BM25 scoring + top-k.

The training-data loop constantly runs "find the documents most like this
query" sweeps — quality-probe retrieval, targeted decontamination, corpus
exploration. BM25 (Robertson/Spärck Jones; the Lucene-default scoring
function) is the standard lexical ranker, and it is fully expressible as
declarative DataFrame algebra — no UDFs, no index service:

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*|d|/avgdl))

100 TB shape: the expensive object — the full inverted index — is never
built. The exploded token stream is filtered to the (broadcast) query-term
set FIRST, so everything downstream is proportional to the postings of the
handful of query terms, not the corpus vocabulary:

  1. one corpus scan -> per-doc length (tiny: one row per doc);
  2. same scan branch -> explode, filter to query terms, count -> the
     (doc, term, tf) postings slice;
  3. per-term document frequency (|terms| rows) joined back by broadcast;
  4. per-doc score sum -> global top-k via orderBy+limit, which Spark
     executes as TakeOrderedAndProject (no full sort, no single-node
     funnel of the corpus — only k rows per partition reach the driver).

The corpus statistics (N, avgdl) are a 1-row aggregate broadcast by
crossJoin — the established scalar-broadcast pattern (profile.py).
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
    appear.
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    toks = docs.select(
        "doc_id", F.explode(F.expr(tokens_expr)).alias("token")
    )
    lengths = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = lengths.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    # postings for the query terms only — the broadcast-hash semi filter
    # reaches the scan side, everything after is query-sized
    term_lit = F.array(*[F.lit(t) for t in terms])
    postings = (
        toks.filter(F.array_contains(term_lit, F.col("token")))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_t = postings.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )

    scored = (
        postings.join(F.broadcast(df_t), "token")
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("term_score").alias("score"),
            F.count("*").alias("n_matched"),
        )
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
