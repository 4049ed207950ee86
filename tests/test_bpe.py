"""BPE trainer tests: the merge rewrite against a pure-Python greedy
model, and determinism/selection invariants of the training loop."""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from audit_star_spark.analytics.bpe import _merge_expr, bpe_train

# the token pool deliberately includes SQL-literal hazards: backslash
# (Spark applies C-style escapes inside string literals — '\b' would
# become backspace without _sq doubling it) and a single quote
TOKEN = st.sampled_from(["a", "b", "c", "\\", "'", "\\b"])
DOC = st.lists(TOKEN, min_size=0, max_size=12)


def _model_merge(tokens: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for t in tokens:
        if out and out[-1] == a and t == b:
            out[-1] = f"{a} {b}"
        else:
            out.append(t)
    return out


@settings(max_examples=30, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=25), st.tuples(TOKEN, TOKEN))
def test_merge_fold_matches_greedy_model(spark, docs, pair):
    a, b = pair
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)], "doc_id long, toks array<string>"
    )
    out = {
        r["doc_id"]: r["m"]
        for r in df.select("doc_id", F.expr(_merge_expr(a, b)).alias("m")).collect()
    }
    for i, toks in enumerate(docs):
        assert out[i] == _model_merge(toks, a, b), (toks, a, b, out[i])


def test_bpe_train_invariants(spark):
    docs = spark.createDataFrame(
        [(1, "x y x y x y z"), (2, "x y q q q"), (3, "z z x y")],
        "doc_id long, text string",
    )
    merges, toks = bpe_train(docs, n_merges=2)
    toks.unpersist()
    # round 1 must pick the most frequent adjacent pair: (x, y) x5
    assert merges[0][1:] == ("x", "y", 5)
    # counts never increase round over round (the winning pair's frequency
    # is the max of a corpus that only lost pair occurrences)
    assert merges[1][3] <= merges[0][3]
    # rewritten corpus has no remaining adjacent (x, y) pair
    remaining = toks.select(
        F.expr(
            "size(filter(sequence(1, size(toks) - 1), "
            "i -> toks[i - 1] = 'x' AND toks[i] = 'y'))"
        ).alias("n")
    ).agg(F.sum("n")).first()[0]
    assert remaining == 0


def test_bpe_apply_respects_rule_order(spark):
    from audit_star_spark.analytics.bpe import bpe_apply

    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z w"), (3, "q")], "doc_id long, text string"
    )
    # rule 1 merges (x, y); rule 2 merges the MERGED token with z — the
    # second rule only fires because the first already rewrote the array
    out = {
        r["doc_id"]: r["toks"]
        for r in bpe_apply(docs, [("x", "y"), ("x y", "z")]).collect()
    }
    assert out[1] == ["x y z"]
    assert out[2] == ["x y z", "w"]
    assert out[3] == ["q"]


def test_bpe_apply_equals_train_rewrite_on_same_corpus(spark):
    """Encoding the training corpus with the trained rules must reproduce
    the training loop's own final rewrite exactly."""
    from audit_star_spark.analytics.bpe import bpe_apply, bpe_train

    docs = spark.createDataFrame(
        [(1, "x y x y x y z"), (2, "x y q q q"), (3, "z z x y")],
        "doc_id long, text string",
    )
    merges, trained = bpe_train(docs, n_merges=2)
    applied = {
        r["doc_id"]: r["toks"]
        for r in bpe_apply(docs, [(a, b) for _, a, b, _ in merges]).collect()
    }
    want = {r["doc_id"]: r["toks"] for r in trained.collect()}
    trained.unpersist()
    assert applied == want
