"""Linear text-quality classifier on hashed bag-of-token features — the
fastText-style filter of published corpus pipelines (CCNet trains a
linear classifier on Wikipedia-vs-crawl; LLaMA keeps pages it scores
"reference-like"). This is that component as pure DataFrame algebra:

- FEATURES: the hashing trick (Weinberger et al. 2009) — feature id =
  md5-prefix(token) mod n_features (the repo's engine-portable hash
  idiom), value = token count / doc length (L1-normalized term
  frequency). No vocabulary object to ship: the feature map is a pure
  function, so training and scoring are joins.
- MODEL: logistic regression trained with FIXED-STEP full-batch
  gradient descent from w = 0 (bias handled as feature id n_features):

      p_i    = sigmoid(sum_f w_f x_if)
      grad_f = sum_i (p_i - y_i) * x_if / N
      w_f   -= lr * grad_f

  A fixed small step count is the oracle-checkable training unit (the
  kmeans_update / pq_train convention); callers extend it driver-side.

100 TB shape: the token explode is in-row; feature rows are
(doc_id, feat, x) triples that partial-aggregate map-side into at most
n_features gradient rows per step; weights are a <= n_features + 1 row
frame that BROADCASTS into both the score and gradient joins. Per GD
step: one corpus-keyed aggregation (scores per doc) and one
feature-keyed aggregation (gradient) — no driver-side data motion at
all. Scoring a new corpus is one broadcast join + one aggregation.

Bit-determinism vs scale: every float reduction over an unordered
group honors the ``bit_exact`` switch (functions/folds.py) — True (the
gate default) folds the SORTED collected values for oracle bit-parity;
False is production plain SUM (map-side combinable, O(1) buffers —
the gradient group is docs-per-feature, corpus-proportional, so the
sorted fold's collect_list buffer would grow with the corpus). Both
paths agree to 1e-9 (tests/test_folds_parity.py). sigmoid's exp is
last-ulp-stable across engines under the 6-decimal output rounding,
the doc_perplexity precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.text import TOKENS_EXPR
from audit_star_spark.functions.folds import fold_sum
from audit_star_spark.plans.iterate import iter_materialize


def hashed_features(
    docs: DataFrame, n_features: int = 512, tokens_expr: str = TOKENS_EXPR
) -> DataFrame:
    """(doc_id, feat, x): L1-normalized hashed term frequencies, plus
    the constant bias feature ``feat = n_features`` with x = 1. Tokens
    hash with the md5-prefix idiom; collisions are the hashing trick's
    documented lossiness (shared by the oracle, which restates the same
    map). Docs with zero tokens still get the bias row."""
    if n_features < 2:
        raise ValueError(f"n_features must be >= 2, got {n_features}")
    toks = (
        docs.select("doc_id", F.explode(F.expr(tokens_expr)).alias("tok"))
        .select(
            "doc_id",
            F.expr(
                "CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT) "
                f"% {n_features}"
            ).alias("feat"),
        )
        .groupBy("doc_id", "feat")
        .agg(F.count("*").alias("c"))
    )
    n = toks.groupBy("doc_id").agg(F.sum("c").alias("n"))
    tf = toks.join(n, "doc_id").select(
        "doc_id", "feat", (F.col("c") / F.col("n")).alias("x")
    )
    bias = docs.select(
        "doc_id",
        F.lit(n_features).cast("long").alias("feat"),
        F.lit(1.0).alias("x"),
    )
    return tf.unionByName(bias)


def train_logreg(
    features: DataFrame,
    labels: DataFrame,
    lr: float = 1.0,
    steps: int = 2,
    bit_exact: bool = True,
) -> DataFrame:
    """Fixed-step full-batch GD from w = 0 over (doc_id, feat, x)
    features and (doc_id, label 0/1) labels. Returns (feat, w).

    w = 0 makes step 1's scores exactly 0 (p = 0.5 for every doc), so
    the first gradient is label-balance algebra — a property the tests
    pin. Weights never leave the cluster: each step is one doc-keyed
    and one feat-keyed aggregation with the <= n_features + 1 row
    weight frame broadcast in."""
    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    if lr <= 0:
        raise ValueError(f"lr must be positive, got {lr}")
    y = labels.select("doc_id", F.col("label").cast("double").alias("y"))
    n_docs = y.count()  # bounded: one scalar, the batch size
    if n_docs == 0:
        # an empty label frame would otherwise divide the gradient by
        # zero and silently produce NaN weights
        raise ValueError("empty labels frame: nothing to train on")
    w = None  # w = 0: represented as an absent frame on the first step
    for _ in range(steps):
        if w is None:
            scored = y.select("doc_id", F.lit(0.0).alias("s"))
        else:
            s = (
                features.join(F.broadcast(w), "feat")
                .select("doc_id", (F.col("x") * F.col("w")).alias("xw"))
                .groupBy("doc_id")
                .agg(F.expr(fold_sum("xw", bit_exact)).alias("s"))
            )
            # docs whose every feature has zero weight keep s = 0
            scored = y.select("doc_id").join(s, "doc_id", "left").select(
                "doc_id", F.coalesce("s", F.lit(0.0)).alias("s")
            )
        resid = scored.join(y, "doc_id").select(
            "doc_id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s"))) - F.col("y")).alias(
                "r"
            ),
        )
        grad = (
            features.join(resid, "doc_id")
            .select("feat", (F.col("x") * F.col("r")).alias("g"))
            .groupBy("feat")
            .agg(
                (
                    F.expr(fold_sum("g", bit_exact)) / F.lit(float(n_docs))
                ).alias("gm")
            )
        )
        step_w = grad.select(
            "feat", (F.lit(-float(lr)) * F.col("gm")).alias("dw")
        )
        if w is None:
            w = step_w.select("feat", F.col("dw").alias("w"))
        else:
            w = (
                w.join(step_w, "feat", "outer")
                .select(
                    "feat",
                    (
                        F.coalesce("w", F.lit(0.0))
                        + F.coalesce("dw", F.lit(0.0))
                    ).alias("w"),
                )
            )
        # materialize the BOUNDED (<= n_features + 1 row) weight frame
        # per step: the next step's score join, its gradient join and
        # the final scoring all consume it, and without truncation each
        # consumer re-plans and re-executes the whole GD chain (the
        # pq_train codebook rationale, plans/iterate.py)
        w = iter_materialize(w)
    return w


def score_docs(
    features: DataFrame, weights: DataFrame, bit_exact: bool = True
) -> DataFrame:
    """(doc_id, score, prob): the linear score and sigmoid probability
    of label 1 under the trained weights — one broadcast join and one
    doc-keyed aggregation; the quality-filter decision is
    ``prob >= threshold`` downstream."""
    s = (
        features.join(F.broadcast(weights), "feat")
        .select("doc_id", (F.col("x") * F.col("w")).alias("xw"))
        .groupBy("doc_id")
        .agg(F.expr(fold_sum("xw", bit_exact)).alias("score"))
    )
    return s.select(
        "doc_id",
        "score",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score")))).alias("prob"),
    )


def quality_classifier_report(
    docs: DataFrame,
    n_features: int = 512,
    lr: float = 1.0,
    steps: int = 2,
    min_tokens: int = 30,
    tokens_expr: str = TOKENS_EXPR,
    bit_exact: bool = True,
) -> DataFrame:
    """End to end, self-supervised: weak labels from a closed-form
    length gate (label 1 iff the doc has >= min_tokens tokens — the
    cheap proxy published pipelines bootstrap from when no curated
    positive set exists), train ``steps`` GD steps, score every doc,
    and report per source: n_docs, n_positive_label, mean_prob (6 dp),
    n_pred_positive (prob >= 0.5). The interesting signal is the model
    transferring the length gate onto token CONTENT — and the gate
    checks the training algebra end to end."""
    # tokenize ONCE (persisted): labels, the feature explode and the
    # per-source report otherwise each re-run the regex tokenizer over
    # the corpus (the lm._tokens_prepared rationale); the feature
    # triples persist too — they feed every GD step's score and
    # gradient joins plus the final scoring pass, and each consumer
    # otherwise re-runs the explode + hash + normalize subtree
    tl = docs.select(
        "doc_id", "source", F.expr(tokens_expr).alias("__toks")
    ).persist()
    labels = tl.select(
        "doc_id",
        (F.size(F.col("__toks")) >= min_tokens).cast("int").alias("label"),
    )
    feats = hashed_features(tl, n_features, "__toks").persist()
    w = train_logreg(feats, labels, lr=lr, steps=steps, bit_exact=bit_exact)
    scored = score_docs(feats, w, bit_exact=bit_exact)
    return (
        tl.select("doc_id", "source")
        .join(labels, "doc_id")
        .join(scored, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("label").cast("long").alias("n_positive_label"),
            F.round(F.avg("prob"), 6).alias("mean_prob"),
            # threshold the ROUNDED prob: a cross-engine exp ulp must
            # not flip a borderline decision (the hybrid-RRF precedent)
            F.sum((F.round(F.col("prob"), 6) >= 0.5).cast("long"))
            .cast("long")
            .alias("n_pred_positive"),
        )
    )
