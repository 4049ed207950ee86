"""Embedding drift statistics between two corpora — the covariate-shift
monitor a production embedding pipeline runs when a new crawl snapshot,
encoder version, or data source lands: per-dimension means/variances of
the two sides, the standardized mean difference (Cohen's d with pooled
variance — the effect size drift dashboards alarm on), and the
per-dimension diagonal Fréchet term (the FID of Heusel et al. 2017
restricted to diagonal covariance, whose sum over dimensions is the
dashboard's single drift number).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.functions.folds import fold_sum


def embedding_drift(
    emb: DataFrame, side=None, bit_exact: bool = True
) -> DataFrame:
    """One row per embedding dimension comparing side 0 (reference) and
    side 1 (candidate): (i, n_a, n_b, mean_a6, mean_b6, var_a6, var_b6,
    smd6, fid_term6). ``side`` is any 0/1 integer Column (default label
    parity — the gate's stand-in for old/new snapshot); variances are
    population (/n), computed two-pass (center first — the numerically
    stable form, and the one the oracle restates verbatim); ``smd6`` is
    NULL via an explicit CASE when both variances are zero (never an
    engine's division-by-zero behavior). sum(fid_term) over dimensions
    = the diagonal-covariance Fréchet distance.

    Scale shape: two corpus passes (posexplode -> groupBy(side, dim)
    with map-side combine; the join back for centering is on the
    BOUNDED (side, dim) key against a broadcastable 2*D-row frame), a
    2*D-row pivot join at the end — no corpus window, no driver loop.
    ``bit_exact`` switches the corpus-sized per-dimension sums between
    the sorted fold (gate: engine-exact vs DuckDB) and plain SUM
    (production: O(1) buffers) — the pca.py convention."""
    if side is None:
        side = F.col("label") % 2
    from audit_star_spark.analytics.similarity import VEC_EXPR
    from audit_star_spark.util import spread

    base = spread(emb.withColumn("side", side)).select(
        "side", F.expr(VEC_EXPR).alias("vec")
    )
    ex = base.select("side", F.posexplode("vec").alias("i", "x"))
    mean = ex.groupBy("side", "i").agg(
        (
            F.expr(fold_sum("x", bit_exact)) / F.count("*").cast("double")
        ).alias("m"),
        F.count("*").alias("n"),
    )
    cen = ex.join(F.broadcast(mean.select("side", "i", "m")), ["side", "i"]).select(
        "side", "i", ((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias("v")
    )
    var = cen.groupBy("side", "i").agg(
        (
            F.expr(fold_sum("v", bit_exact)) / F.count("*").cast("double")
        ).alias("var")
    )
    st = mean.join(var, ["side", "i"])
    a = st.filter(F.col("side") == 0).select(
        "i",
        F.col("n").alias("n_a"),
        F.col("m").alias("ma"),
        F.col("var").alias("va"),
    )
    b = st.filter(F.col("side") == 1).select(
        "i",
        F.col("n").alias("n_b"),
        F.col("m").alias("mb"),
        F.col("var").alias("vb"),
    )
    pooled = (F.col("va") + F.col("vb")) / F.lit(2.0)
    smd = F.when(
        F.col("va") + F.col("vb") > 0,
        (F.col("ma") - F.col("mb")) / F.sqrt(pooled),
    )
    fid = (
        (F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))
        + F.col("va")
        + F.col("vb")
        - F.lit(2.0) * F.sqrt(F.col("va") * F.col("vb"))
    )
    return a.join(b, "i").select(
        F.col("i").cast("long").alias("i"),  # posexplode pos is int32;
        # the oracle's generate-series index is BIGINT
        "n_a",
        "n_b",
        F.round("ma", 6).alias("mean_a6"),
        F.round("mb", 6).alias("mean_b6"),
        F.round("va", 6).alias("var_a6"),
        F.round("vb", 6).alias("var_b6"),
        F.round(smd, 6).alias("smd6"),
        F.round(fid, 6).alias("fid_term6"),
    )


def vocab_drift(
    docs: DataFrame,
    k: int = 100,
    side=None,
    tokens_expr: str | None = None,
) -> DataFrame:
    """Vocabulary drift between two corpora — the text-side twin of
    :func:`embedding_drift`: per-token unigram rates of a reference
    (side 0) and candidate (side 1) corpus and each token's
    Jensen-Shannon divergence contribution

        js(t) = p ln(p/m) / 2 + q ln(q/m) / 2,   m = (p + q) / 2

    (zero terms via explicit CASE when a side never saw the token —
    never an engine's 0*ln(0) behavior). Returns the top-``k`` tokens
    by contribution — "which tokens drifted most", the actionable form
    of the dashboard's summed JS number. ``side`` is any 0/1 integer
    Column (default doc_id parity — the gate's stand-in for
    old/new snapshot).

    Scale shape: explode -> ONE map-side-combined (side, token) count
    (shuffle bounded by distinct tokens, not corpus tokens), a 1-row
    side-total reduction (the accepted bounded scalar shape), a
    token-keyed full outer join of the two bounded vocabularies, and a
    TakeOrdered top-k — no corpus window. Determinism: rates are exact
    integer ratios, js is the same IEEE expression per token in both
    engines, ranking ties break on the token string; rounding to 6 dp
    happens after the ranking."""
    from audit_star_spark.analytics.text import TOKENS_EXPR

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if side is None:
        side = F.col("doc_id") % 2
    toks = (
        docs.withColumn("side", side)
        .select("side", F.explode(F.expr(tokens_expr or TOKENS_EXPR)).alias("token"))
        .filter(F.length("token") > 0)
    )
    tf = toks.groupBy("side", "token").agg(F.count("*").alias("c"))
    return vocab_drift_from_counts(tf, k)


def vocab_drift_from_counts(tf: DataFrame, k: int) -> DataFrame:
    """The ranking tail over a (side, token, c) count frame — shared by
    :func:`vocab_drift` and the streaming store's census-at-read so
    batch and stream cannot drift (and, counts being integers, the
    stream's merged partials reproduce the batch output EXACTLY)."""
    tots = tf.groupBy().agg(
        F.sum(F.when(F.col("side") == 0, F.col("c"))).alias("ta"),
        F.sum(F.when(F.col("side") == 1, F.col("c"))).alias("tb"),
    )
    a = tf.filter(F.col("side") == 0).select("token", F.col("c").alias("ca"))
    b = tf.filter(F.col("side") == 1).select("token", F.col("c").alias("cb"))
    j = (
        a.join(b, "token", "full")
        .select(
            "token",
            F.coalesce("ca", F.lit(0)).alias("c_a"),
            F.coalesce("cb", F.lit(0)).alias("c_b"),
        )
        .crossJoin(F.broadcast(tots))
    )
    p = F.col("c_a") / F.col("ta").cast("double")
    q = F.col("c_b") / F.col("tb").cast("double")
    scored = j.select(
        "token",
        "c_a",
        "c_b",
        p.alias("p"),
        q.alias("q"),
        ((p + q) / F.lit(2.0)).alias("m"),
    )
    js = (
        F.when(
            F.col("p") > 0,
            F.col("p") * F.log(F.col("p") / F.col("m")) / F.lit(2.0),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("q") > 0,
            F.col("q") * F.log(F.col("q") / F.col("m")) / F.lit(2.0),
        ).otherwise(F.lit(0.0))
    )
    return (
        scored.withColumn("js", js)
        .orderBy(F.col("js").desc(), "token")
        .limit(k)
        .select(
            "token",
            "c_a",
            "c_b",
            F.round("p", 6).alias("p6"),
            F.round("q", 6).alias("q6"),
            F.round("js", 6).alias("js6"),
        )
    )
