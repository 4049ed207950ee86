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


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    pool: int = 20,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    Büttcher 2009 — the standard way to combine a lexical and a dense
    ranking without score calibration):

        rrf(d) = sum over lists L of 1 / (rrf_k + rank_L(d))

    List 1 is BM25 over ``query_terms`` (bm25_topk, one corpus scan);
    list 2 is the exact cosine top-``pool`` for ``query_vec_id``'s
    embedding (broadcast query against one scan of the vectors). A
    document missing from a list contributes 0 for it — the standard
    truncated-list convention. Returns (rank, doc_id, rrf, r_lex,
    r_sem) for the fused top-k; ranks tie-break on doc_id.

    Cross-engine determinism: BM25 scores end in ``ln`` whose last ulp
    differs between engines, so the lexical rank is taken over the
    score ROUNDED to 6 decimals (the same stabilization bm25_search
    uses); cosine is fold/sqrt/divide only — bit-identical — and the
    rrf sum is two fixed-order terms of exact-input divisions.

    100 TB shape: both branches are one-scan rankings with broadcast
    query sides; the fusion itself joins two <= pool-row frames — the
    whole post-retrieval stage is driver-trivial no matter the corpus
    size."""
    from pyspark.sql import Window

    from audit_star_spark.analytics.similarity import _dot, _prepared

    if pool < k:
        raise ValueError(f"pool {pool} must be >= k {k}")
    lex = bm25_topk(docs, query_terms, k=pool)
    wl = Window.orderBy(F.round("score", 6).desc(), F.col("doc_id"))
    lex_r = lex.select("doc_id", F.row_number().over(wl).alias("r_lex"))

    base = _prepared(emb)
    q = base.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("qvec"), F.col("norm").alias("qnorm")
    )
    cos = _dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))
    sem = (
        base.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("doc_id"))
        .limit(pool)
    )
    ws = Window.orderBy(F.col("cosine").desc(), F.col("doc_id"))
    sem_r = sem.select("doc_id", F.row_number().over(ws).alias("r_sem"))

    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("r_lex")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("r_sem")), F.lit(0.0)
    )
    fused = lex_r.join(sem_r, "doc_id", "full_outer").select(
        "doc_id", "r_lex", "r_sem", rrf.alias("rrf")
    )
    wf = Window.orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", F.round("rrf", 9).alias("rrf"), "r_lex", "r_sem")
    )
