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


def _tokens_prepared(
    docs: DataFrame, tokens_expr: str, extra: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, *extra, __toks) with the tokenizer evaluated ONCE and
    the frame persisted: the LM operators each need several passes over
    the token stream (n-gram counts, unigram counts, scoring), and
    without materialization every pass re-runs the regex split over the
    corpus — tokenization dominated the perplexity family's CPU (the
    _trigrams docstring measured the quadratic variant of the same
    trap). If ``tokens_expr`` already names a materialized ``__toks``
    column (a caller that prepared the frame itself — the composition
    paths), the input passes through untouched, so nesting never
    double-caches. Persisted entries release on the session's next
    clearCache like the KN type table (kn_tables_from_counts' lifetime
    note)."""
    if tokens_expr == "__toks" and "__toks" in docs.columns:
        cols = ["doc_id", *extra, "__toks"]
        return docs.select(*cols)
    return docs.select(
        "doc_id", *extra, F.expr(tokens_expr).alias("__toks")
    ).persist()


def train_bigram_lm(
    docs: DataFrame, tokens_expr: str = TOKENS_EXPR
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables of the model: (bigram_counts(w1, w2, c2),
    unigram_counts(w1, c1), vocab_stats(v) — one row, |vocab|).

    |vocab| is the ROW COUNT of the unigram table (the set of distinct
    tokens IS its key set) — not a separate countDistinct pass over the
    token stream, which re-scanned and re-tokenized the corpus for a
    number the unigram aggregate already determines."""
    bg = _bigrams(docs, tokens_expr)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    toks = docs.select(F.explode(F.expr(tokens_expr)).alias("w1"))
    unigram_counts = toks.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = unigram_counts.agg(F.count("*").alias("v"))
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
    # tokenize ONCE (persisted): self-trained scoring otherwise runs
    # the regex tokenizer over the corpus once per consumer — bigram
    # train, unigram train, scoring stream, the keep-every-doc join
    if train_docs is None:
        tl = _tokens_prepared(docs, tokens_expr)
        score_tl = tl
    else:
        tl = _tokens_prepared(train_docs, tokens_expr)
        score_tl = _tokens_prepared(docs, tokens_expr)
    bigram_counts, unigram_counts, vocab = train_bigram_lm(tl, "__toks")
    bg = _bigrams(score_tl, "__toks")
    # nll depends only on the bigram TYPE: join the model tables against
    # the distinct scored types (type-sized), then attach the per-type
    # nll to the corpus stream with ONE equi join — the stream is never
    # shuffled per model table (r14; the score_kn note, one order lower)
    types = bg.select("w1", "w2").distinct()
    nll_by_type = (
        types.join(bigram_counts, ["w1", "w2"], "left")
        .join(unigram_counts, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            (
                -F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + add_k)
                    / (F.coalesce(F.col("c1"), F.lit(0)) + add_k * F.col("v"))
                )
            ).alias("nll"),
        )
    )
    scores = (
        bg.join(nll_by_type, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("nll").alias("avg_nll"),
        )
    )
    # left join back so token-poor documents keep a row (NULL scores)
    return (
        score_tl.select("doc_id")
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


# --------------------------------------- interpolated Kneser-Ney trigram
# The CCNet-grade filter (Chen & Goodman 1999 "An Empirical Study of
# Smoothing Techniques for Language Modeling" §2.7, interpolated KN):
# absolute discounting at the trigram level, CONTINUATION counts (type
# counts, not token counts) at the bigram and unigram levels, and a
# uniform 1/V backstop so OOV tokens score finitely. Every statistic is
# a join/aggregation over the trigram TYPE table, so the whole model is
# SQL-oracle-able:
#
#   P3(c|a,b) = max(c3(abc) - D, 0)/c12(ab) + D*N3f(ab)/c12(ab) * P2(c|b)
#   P2(c|b)   = max(n1(bc) - D, 0)/m(b)     + D*f2(b)/m(b)      * P1(c)
#   P1(c)     = max(n1c(c) - D, 0)/NB       + D*T1/NB           * 1/V
#
# where c3 = trigram token counts, c12 = its prefix sums, N3f(ab) =
# distinct continuations of (a,b); n1(bc) = |{a : abc seen}| (the
# continuation count), m(b) = sum_c n1(bc), f2(b) = distinct c with
# n1(bc) > 0; n1c(c) = |{b : (b,c) a trigram-type suffix}|, NB = total
# distinct (b,c) suffix types, T1 = distinct c among them, V = train
# vocabulary. Unseen contexts back off cleanly (gamma = 1): c12 = 0 =>
# P3 = P2; m = 0 => P2 = P1. Each level sums to 1 over the vocabulary.


def _trigrams(docs: DataFrame, tokens_expr: str) -> DataFrame:
    """(doc_id, w1, w2, w3) — in-row adjacent triples, zero shuffles.

    Built from a MATERIALIZED token array column via two zip_with
    passes (the _bigrams idiom, one order higher): referencing the
    tokenizer expression inside a per-position lambda would re-run the
    whole regexp split for every element_at at every position —
    O(tokens^2) regex work per document (measured 29 s for 5k docs at
    sf0.1; this shape is sub-second). zip_with zips to the LONGER
    input, padding with NULL, so the two tail pairs carry NULL w2/w3
    and are dropped."""
    return (
        docs.select("doc_id", F.expr(tokens_expr).alias("t"))
        .select(
            "doc_id",
            F.expr(
                "zip_with("
                "  zip_with(t, slice(t, 2, greatest(size(t) - 1, 0)),"
                "           (a, b) -> struct(a AS w1, b AS w2)),"
                "  slice(t, 3, greatest(size(t) - 2, 0)),"
                "  (p, c) -> struct(p.w1 AS w1, p.w2 AS w2, c AS w3))"
            ).alias("tris"),
        )
        .select("doc_id", F.explode("tris").alias("g"))
        .filter(F.col("g.w2").isNotNull() & F.col("g.w3").isNotNull())
        .select(
            "doc_id",
            F.col("g.w1").alias("w1"),
            F.col("g.w2").alias("w2"),
            F.col("g.w3").alias("w3"),
        )
    )


def train_kn_trigram_lm(
    docs: DataFrame, tokens_expr: str = TOKENS_EXPR
) -> dict[str, DataFrame]:
    """The count tables of the interpolated-KN trigram model. All type
    statistics derive from one distinct over the trigram stream; every
    aggregate is map-side-combinable. Returns a dict of DataFrames:
    tri (w1,w2,w3,c3), ctx (w1,w2,c12,n3f), cont (w2,w3,n1),
    mid (w2,m,f2), uni (w3,n1c), totals (nb,t1,v) — one row."""
    tri_stream = _trigrams(docs, tokens_expr)
    tri = tri_stream.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    vocab = (
        docs.select(F.explode(F.expr(tokens_expr)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    return kn_tables_from_counts(tri, vocab)


def kn_tables_from_counts(tri: DataFrame, vocab: DataFrame) -> dict[str, DataFrame]:
    """Derive every KN statistic from the raw MERGEABLE count tables —
    tri (w1, w2, w3, c3) trigram token counts and vocab (w, c) unigram
    token counts. Both merge across shards/batches by summing c, so a
    streaming store only ever persists these two; continuation (type)
    counts are functions of WHICH keys exist, which the merged type
    table preserves exactly.

    The type table is persisted here: FIVE derived tables (and the
    scoring joins) hang off it inside one physical plan, and without
    materialization Spark re-derives the corpus-wide trigram aggregate
    once per consumer — measured 5x the query time at sf0.1. At real
    scale this materialization is a write of the model tables to
    storage (exactly what the streaming count store does).

    LIFETIME: the caller owns the persisted table — call
    :func:`release_kn_model` on the returned dict when the model is no
    longer needed, or repeated derivations (e.g. a fresh ``model()``
    per read) accumulate persisted datasets for the session's life.
    StreamingKNCounts.model() does this for its previous hand-out."""
    tri = tri.persist()
    ctx = tri.groupBy("w1", "w2").agg(
        F.sum("c3").alias("c12"), F.count("*").alias("n3f")
    )
    cont = tri.groupBy("w2", "w3").agg(F.count("*").cast("long").alias("n1"))
    mid = cont.groupBy("w2").agg(
        F.sum("n1").alias("m"), F.count("*").cast("long").alias("f2")
    )
    uni = cont.groupBy("w3").agg(F.count("*").cast("long").alias("n1c"))
    v = vocab.agg(F.count("*").alias("v"))
    totals = (
        uni.agg(
            F.sum("n1c").alias("nb"), F.count("*").cast("long").alias("t1")
        )
        .crossJoin(F.broadcast(v))
    )
    return {"tri": tri, "ctx": ctx, "cont": cont, "mid": mid, "uni": uni,
            "totals": totals}


def release_kn_model(model: dict[str, DataFrame]) -> None:
    """Release the persisted trigram type table backing a KN model dict
    (kn_tables_from_counts' lifetime contract). Safe to call twice;
    scoring frames already computed stay valid, but new actions against
    the dict's tables will re-derive the trigram aggregate."""
    model["tri"].unpersist()


def doc_perplexity_kn(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    discount: float = 0.75,
    tokens_expr: str = TOKENS_EXPR,
) -> DataFrame:
    """Per-document perplexity under an interpolated Kneser-Ney TRIGRAM
    LM trained on ``train_docs`` (default: ``docs`` itself). Returns
    (doc_id, n_trigrams, avg_nll, perplexity); documents with fewer than
    3 tokens keep NULL scores (their own quality class, like the bigram
    filter).

    100 TB shape: training is a handful of keyed aggregations over the
    in-row trigram explode (each one shuffle with map-side combine);
    scoring left-joins the candidate trigram stream against the count
    tables on progressively shorter keys — the (w1,w2,w3) join dominates
    and is an AQE-handled equi join proportional to corpus tokens, the
    honest cost of exact counts. The totals row broadcasts."""
    if not 0 < discount < 1:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    # tokenize ONCE (persisted) — the trigram stream, the vocab scan
    # and the scoring stream otherwise each re-run the regex tokenizer
    # over the corpus (the _tokens_prepared note)
    if train_docs is None:
        tl = _tokens_prepared(docs, tokens_expr)
        score_tl = tl
    else:
        tl = _tokens_prepared(train_docs, tokens_expr)
        score_tl = _tokens_prepared(docs, tokens_expr)
    model = train_kn_trigram_lm(tl, "__toks")
    return score_kn(score_tl, model, discount=discount, tokens_expr="__toks")


def score_kn(
    docs: DataFrame,
    model: dict[str, DataFrame],
    discount: float = 0.75,
    tokens_expr: str = TOKENS_EXPR,
) -> DataFrame:
    """Score ``docs`` against a prebuilt KN model dict (the
    train_kn_trigram_lm / kn_tables_from_counts shape) — the scoring
    half of :func:`doc_perplexity_kn`, shared with the streaming count
    store.

    Scale shape (r14): the interpolated probability depends only on the
    trigram TYPE, so the five model lookups join against the DISTINCT
    scored types (type-sized frames on both sides) and the corpus-sized
    trigram stream is exchanged exactly twice — once to attach the
    per-type nll, once for the per-document aggregate. Joining the
    stream itself against each model table shuffled the corpus-token
    stream FIVE times on five different keys (the pre-r14 shape)."""
    if not 0 < discount < 1:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    d = F.lit(float(discount))
    tg = _trigrams(docs, tokens_expr)
    types = tg.select("w1", "w2", "w3").distinct()
    j = (
        types.join(model["tri"], ["w1", "w2", "w3"], "left")
        .join(model["ctx"], ["w1", "w2"], "left")
        .join(model["cont"], ["w2", "w3"], "left")
        .join(model["mid"], "w2", "left")
        .join(model["uni"], "w3", "left")
        .crossJoin(F.broadcast(model["totals"]))
    )
    p1 = (
        F.greatest(F.coalesce(F.col("n1c"), F.lit(0)) - d, F.lit(0.0))
        / F.col("nb")
        + d * F.col("t1") / F.col("nb") / F.col("v")
    )
    p2 = F.when(
        F.coalesce(F.col("m"), F.lit(0)) > 0,
        F.greatest(F.coalesce(F.col("n1"), F.lit(0)) - d, F.lit(0.0))
        / F.col("m")
        + d * F.col("f2") / F.col("m") * p1,
    ).otherwise(p1)
    p3 = F.when(
        F.coalesce(F.col("c12"), F.lit(0)) > 0,
        F.greatest(F.coalesce(F.col("c3"), F.lit(0)) - d, F.lit(0.0))
        / F.col("c12")
        + d * F.col("n3f") / F.col("c12") * p2,
    ).otherwise(p2)
    nll_by_type = j.select(
        "w1", "w2", "w3", (-F.log(p3)).alias("nll")
    )
    scores = (
        tg.join(nll_by_type, ["w1", "w2", "w3"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.avg("nll").alias("avg_nll"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scores, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
            "avg_nll",
            F.exp("avg_nll").alias("perplexity"),
        )
    )


def kn_perplexity_sql(
    table: str, text_col: str, discount: float = 0.75
) -> str:
    """DuckDB mirror of :func:`doc_perplexity_kn` (self-trained),
    generated from the same discount."""
    tok = (
        f"str_split(regexp_replace(trim(lower({text_col})), "
        "'\\s+', ' ', 'g'), ' ')"
    )
    d = float(discount)
    return f"""
WITH tl AS (SELECT doc_id, {tok} AS toks FROM {table}),
tg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
  FROM tl, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i)
  WHERE len(toks) >= 3
),
tri AS (SELECT w1, w2, w3, count(*) AS c3 FROM tg GROUP BY 1, 2, 3),
ctx AS (SELECT w1, w2, sum(c3) AS c12, count(*) AS n3f FROM tri GROUP BY 1, 2),
cont AS (SELECT w2, w3, count(*) AS n1 FROM tri GROUP BY 1, 2),
mid AS (SELECT w2, sum(n1) AS m, count(*) AS f2 FROM cont GROUP BY 1),
uni AS (SELECT w3, count(*) AS n1c FROM cont GROUP BY 1),
voc AS (SELECT count(DISTINCT w) AS v
        FROM (SELECT unnest(toks) AS w FROM tl)),
tot AS (SELECT sum(n1c) AS nb, count(*) AS t1, voc.v AS v
        FROM uni CROSS JOIN voc GROUP BY voc.v),
prob AS (
  SELECT tg.doc_id,
         -ln(CASE WHEN coalesce(ctx.c12, 0) > 0 THEN
               greatest(coalesce(tri.c3, 0) - {d}, 0.0) / ctx.c12
               + {d} * ctx.n3f / ctx.c12 *
                 (CASE WHEN coalesce(mid.m, 0) > 0 THEN
                    greatest(coalesce(cont.n1, 0) - {d}, 0.0) / mid.m
                    + {d} * mid.f2 / mid.m *
                      (greatest(coalesce(uni.n1c, 0) - {d}, 0.0) / tot.nb
                       + {d} * tot.t1 / tot.nb / tot.v)
                  ELSE greatest(coalesce(uni.n1c, 0) - {d}, 0.0) / tot.nb
                       + {d} * tot.t1 / tot.nb / tot.v END)
             WHEN coalesce(mid.m, 0) > 0 THEN
               greatest(coalesce(cont.n1, 0) - {d}, 0.0) / mid.m
               + {d} * mid.f2 / mid.m *
                 (greatest(coalesce(uni.n1c, 0) - {d}, 0.0) / tot.nb
                  + {d} * tot.t1 / tot.nb / tot.v)
             ELSE greatest(coalesce(uni.n1c, 0) - {d}, 0.0) / tot.nb
                  + {d} * tot.t1 / tot.nb / tot.v END) AS nll
  FROM tg
  LEFT JOIN tri USING (w1, w2, w3)
  LEFT JOIN ctx USING (w1, w2)
  LEFT JOIN cont USING (w2, w3)
  LEFT JOIN mid USING (w2)
  LEFT JOIN uni USING (w3)
  CROSS JOIN tot
),
scores AS (
  SELECT doc_id, count(*) AS n_trigrams, avg(nll) AS avg_nll
  FROM prob GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(s.n_trigrams, 0) AS n_trigrams,
       s.avg_nll,
       exp(s.avg_nll) AS perplexity
FROM {table} t LEFT JOIN scores s ON t.doc_id = s.doc_id
"""


def perplexity_bins(
    docs: DataFrame,
    n_bins: int = 3,
    tokens_expr: str = TOKENS_EXPR,
    mode: str = "window",
) -> DataFrame:
    """CCNet's perplexity binning (Wenzek et al. 2020): rank every
    document by self-trained bigram-LM perplexity WITHIN its language
    and cut into ``n_bins`` equal-depth bins — bin 1 is the "head"
    CCNet keeps, the tail is the crawl noise. Returns per (lang, bin):
    n_docs, ppl_min, ppl_max.

    Cross-engine determinism: the cut orders by the 6-dp ROUNDED
    perplexity then doc_id — raw floats differ in the last ulp between
    engines (the doc_perplexity precedent), and a tie at 1e-15 must
    not flip two documents across a bin boundary. Documents too short
    to score (no bigrams) are excluded — their own quality class.

    Scale shape: the LM is two count joins (doc_perplexity). The cut:
    - mode='window' — ONE language-keyed ntile window: fine for a
      many-language corpus, but CCNet's actual use (a monolingual or
      English-dominated crawl) funnels the dominant language through
      ONE window partition — a single task sorts the corpus;
    - mode='distributed' — the gapless_ids two-pass offset scheme:
      range-partition + sort the whole frame on (lang, ppl6, doc_id)
      (each LANGUAGE spreads across many partitions by perplexity),
      assign global gapless row ids, subtract each language's first id
      (a #langs-row broadcast) to get the within-language rank, then
      apply ntile's EXACT closed form — the first n mod k buckets get
      ceil(n/k) rows, the rest floor(n/k). Bit-identical to the window
      path (test-locked), with no corpus-sized window partition
      anywhere in the plan.
    """
    return perplexity_binned_docs(
        docs, n_bins=n_bins, tokens_expr=tokens_expr, mode=mode
    ).groupBy("lang", "bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("ppl6").alias("ppl_min"),
        F.max("ppl6").alias("ppl_max"),
    )


def perplexity_binned_docs(
    docs: DataFrame,
    n_bins: int = 3,
    tokens_expr: str = TOKENS_EXPR,
    mode: str = "window",
) -> DataFrame:
    """The per-DOCUMENT frame behind :func:`perplexity_bins`: (doc_id,
    lang, ppl6, bin) for every scorable document — factored out so
    pipeline compositions (ccnet_disposition) can consume the document
    verdicts directly. Same determinism rule (6-dp rounded perplexity
    then doc_id) and the same mode switch; see perplexity_bins for the
    scale discussion."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    # one persisted (doc_id, lang, __toks) frame feeds the LM passes
    # AND the lang join below — without it the whole upstream (for
    # ccnet_disposition: scan + langid + relabel join) re-ran once per
    # consumer (measured as a ~129-Exchange physical plan)
    tl = _tokens_prepared(docs, tokens_expr, extra=("lang",))
    p = doc_perplexity(tl, tokens_expr="__toks")
    scored = (
        tl.select("doc_id", "lang")
        .join(p, "doc_id")
        .filter(F.col("avg_nll").isNotNull())
        .select(
            "doc_id", "lang", F.round("perplexity", 6).alias("ppl6")
        )
    )
    return ntile_cut(scored, n_bins=n_bins, mode=mode)


def ntile_cut(scored: DataFrame, n_bins: int, mode: str = "window") -> DataFrame:
    """Equal-depth per-language ntile over a (doc_id, lang, ppl6) frame
    — the cut stage of :func:`perplexity_binned_docs`, factored out so
    read paths that derive ppl6 from persisted count stores
    (streaming/ccnet.py) run the SAME cut code (one code path, two
    execution modes; the two modes are themselves bit-identical,
    test-locked). See perplexity_bins for the window-vs-distributed
    scale discussion."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    from pyspark.sql import Window

    if mode == "window":
        w = Window.partitionBy("lang").orderBy("ppl6", "doc_id")
        binned = scored.withColumn("bin", F.ntile(n_bins).over(w))
    else:
        from audit_star_spark.operators.ids import gapless_ids

        ids = gapless_ids(
            scored,
            order_by=["lang", "ppl6", "doc_id"],
            id_col="__gid",
            mode=mode,
        )
        # ordering by lang FIRST makes each language's global ids
        # contiguous, so rank-in-language = __gid - min(__gid per lang)
        # + 1; the offset table is one tiny broadcast frame
        off = ids.groupBy("lang").agg(
            F.min("__gid").alias("__lo"), F.count("*").alias("__n")
        )
        # integer ceil-divisions reproduce ntile exactly; when a
        # language has fewer rows than bins, q = 0 and thr = n, so the
        # q-divisor branch is never evaluated on a zero q
        k = n_bins
        bin_expr = (
            f"CAST(CASE WHEN __r <= ((__n div {k}) + 1) * (__n % {k}) THEN "
            f"(__r + (__n div {k})) div ((__n div {k}) + 1) "
            f"ELSE (__n % {k}) + "
            f"(__r - ((__n div {k}) + 1) * (__n % {k}) + (__n div {k}) - 1) "
            f"div (__n div {k}) END AS INT)"
        )
        binned = (
            ids.join(F.broadcast(off), "lang")
            .withColumn("__r", F.col("__gid") - F.col("__lo") + 1)
            .withColumn("bin", F.expr(bin_expr))
            .drop("__gid", "__lo", "__n", "__r")
        )
    return binned


def ccnet_disposition(
    docs: DataFrame,
    n_bins: int = 3,
    tokens_expr: str = TOKENS_EXPR,
    mode: str = "window",
) -> DataFrame:
    """The CCNet pipeline verdict (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    one disposition per document from the three stages run jointly —
    exact dedup (fingerprint keep-first), language identification, and
    per-language LM perplexity binning (bin 1 = head, kept; last bin =
    tail, dropped). Precedence mirrors the paper's pipeline order:

        duplicate > unknown language > unscorable (no bigrams) > bin

    Binning runs within the PREDICTED language — CCNet groups the
    crawl by its own langid output, not by trusted labels. Returns
    (doc_id, pred_lang, is_dup, ppl6, bin, disposition) for EVERY
    document; ppl6/bin stay NULL for unscorable ones.

    Scale shape: each stage is the already-certified operator
    (with_fingerprint in-row fold; with_lang_id in-row regex census;
    perplexity_binned_docs two count-joins + the mode-switched cut) —
    composition adds only doc_id equi-joins."""
    from audit_star_spark.analytics.text import with_fingerprint, with_lang_id

    # both narrow per-doc stage outputs persist: the langid regex
    # census feeds the relabel join AND the final verdict join, the
    # fingerprint fold feeds the keep-first aggregate AND the dup join
    # — one compute each instead of one per consumer
    lang = with_lang_id(docs).select("doc_id", "pred_lang").persist()
    fp = with_fingerprint(docs).select("doc_id", "fingerprint").persist()
    first = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("__keep"))
    dup = (
        fp.join(first, "fingerprint")
        .select("doc_id", (F.col("doc_id") != F.col("__keep")).alias("is_dup"))
    )
    relabeled = (
        docs.select("doc_id", "text")
        .join(lang, "doc_id")
        .select("doc_id", F.col("pred_lang").alias("lang"), "text")
    )
    binned = perplexity_binned_docs(
        relabeled, n_bins=n_bins, tokens_expr=tokens_expr, mode=mode
    ).select("doc_id", "ppl6", "bin")
    return (
        lang.join(dup, "doc_id")
        .join(binned, "doc_id", "left")
        .select(
            "doc_id",
            "pred_lang",
            "is_dup",
            "ppl6",
            F.col("bin").cast("int").alias("bin"),
            ccnet_verdict_expr(n_bins).alias("disposition"),
        )
    )


def ccnet_verdict_expr(n_bins: int) -> F.Column:
    """The CCNet disposition CASE over (is_dup, pred_lang, bin) columns
    — pipeline-order precedence (duplicate > unknown language >
    unscorable > bin), shared by the batch composition above and the
    streaming read path (streaming/ccnet.py) so precedence can never
    drift between modes."""
    return (
        F.when(F.col("is_dup"), F.lit("drop_duplicate"))
        .when(F.col("pred_lang") == "unknown", F.lit("drop_lang"))
        .when(F.col("bin").isNull(), F.lit("drop_unscorable"))
        .when(F.col("bin") == 1, F.lit("keep_head"))
        .when(F.col("bin") < n_bins, F.lit("keep_middle"))
        .otherwise(F.lit("drop_tail"))
    )
