"""Hashed-feature logistic quality classifier (analytics/classifier.py):
pure-Python reference parity for the fixed-step GD training, the w=0
first-step algebra, learning on a separable synthetic corpus, and edge
contracts."""

import hashlib
import math
import re

import pytest


def _toks(text):
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def _feat(tok, nf):
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % nf


def _features(texts, nf):
    out = {}
    for i, t in texts.items():
        tt = _toks(t)
        counts = {}
        for tok in tt:
            counts[_feat(tok, nf)] = counts.get(_feat(tok, nf), 0) + 1
        row = {f: c / len(tt) for f, c in counts.items()}
        row[nf] = 1.0  # bias
        out[i] = row
    return out


def _train_ref(feats, labels, lr, steps):
    n = len(labels)
    w = {}
    for _ in range(steps):
        grad = {}
        for i, y in labels.items():
            s = sum(x * w.get(f, 0.0) for f, x in sorted(feats[i].items()))
            p = 1.0 / (1.0 + math.exp(-s))
            for f, x in feats[i].items():
                grad.setdefault(f, []).append(x * (p - y))
        for f, gs in grad.items():
            gm = sum(sorted(gs)) / n
            w[f] = w.get(f, 0.0) - lr * gm
    return w


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


POS = [
    "good clean prose with many meaningful words flowing naturally",
    "a well written paragraph about science and careful reasoning",
    "thoughtful analysis of history with clear structured arguments",
]
NEG = [
    "buy now click here spam spam",
    "zzz qqq xxx junk junk junk",
    "click click buy buy spam",
]


def test_matches_python_reference(spark):
    from audit_star_spark.analytics.classifier import (
        hashed_features,
        train_logreg,
        score_docs,
    )
    from pyspark.sql import functions as F

    texts = {i: t for i, t in enumerate(POS + NEG)}
    labels = {i: (1 if i < len(POS) else 0) for i in texts}
    nf, lr, steps = 64, 1.0, 3

    docs = _docs(spark, sorted(texts.items()))
    ldf = spark.createDataFrame(
        sorted(labels.items()), "doc_id long, label int"
    )
    feats = hashed_features(docs, n_features=nf)
    w = train_logreg(feats, ldf, lr=lr, steps=steps)
    got_w = {r["feat"]: r["w"] for r in w.collect()}

    ref_w = _train_ref(_features(texts, nf), labels, lr, steps)
    assert set(got_w) == set(ref_w)
    for f in ref_w:
        assert got_w[f] == pytest.approx(ref_w[f], rel=1e-12, abs=1e-15), f

    got_s = {r["doc_id"]: r["prob"] for r in score_docs(feats, w).collect()}
    rf = _features(texts, nf)
    for i in texts:
        s = sum(x * ref_w.get(f, 0.0) for f, x in sorted(rf[i].items()))
        assert got_s[i] == pytest.approx(
            1.0 / (1.0 + math.exp(-s)), rel=1e-9
        ), i


def test_first_step_is_label_balance_algebra(spark):
    """From w = 0 every doc scores p = 0.5, so the bias gradient is
    exactly (0.5 - mean(y)) and the bias weight after one step is
    lr * (mean(y) - 0.5) — pinned exactly."""
    from audit_star_spark.analytics.classifier import (
        hashed_features,
        train_logreg,
    )

    texts = dict(enumerate(POS + NEG))
    docs = _docs(spark, sorted(texts.items()))
    ldf = spark.createDataFrame(
        [(i, 1 if i < 2 else 0) for i in texts],  # 2 of 6 positive
        "doc_id long, label int",
    )
    nf = 32
    w = train_logreg(hashed_features(docs, nf), ldf, lr=2.0, steps=1)
    bias = {r["feat"]: r["w"] for r in w.collect()}[nf]
    # gm = (0.5 - 2/6); w = -lr * gm
    assert bias == pytest.approx(-2.0 * (0.5 - 2.0 / 6.0), rel=1e-12)


def test_learns_separable_corpus(spark):
    """3 GD steps on a lexically separable corpus must classify the
    training set correctly — the filter actually filters."""
    from audit_star_spark.analytics.classifier import (
        hashed_features,
        score_docs,
        train_logreg,
    )

    texts = dict(enumerate((POS * 4) + (NEG * 4)))
    labels = {i: (1 if i < 3 * 4 else 0) for i in texts}
    docs = _docs(spark, sorted(texts.items()))
    ldf = spark.createDataFrame(
        sorted(labels.items()), "doc_id long, label int"
    )
    feats = hashed_features(docs, n_features=256)
    w = train_logreg(feats, ldf, lr=4.0, steps=3)
    got = {r["doc_id"]: r["prob"] for r in score_docs(feats, w).collect()}
    acc = sum(
        1 for i, y in labels.items() if (got[i] >= 0.5) == (y == 1)
    ) / len(labels)
    assert acc == 1.0


def test_zero_token_docs_keep_bias_row_and_score(spark):
    from audit_star_spark.analytics.classifier import (
        hashed_features,
        score_docs,
        train_logreg,
    )

    docs = _docs(spark, [(1, "some actual words here"), (2, "")])
    ldf = spark.createDataFrame([(1, 1), (2, 0)], "doc_id long, label int")
    feats = hashed_features(docs, n_features=16)
    w = train_logreg(feats, ldf, steps=2)
    got = {r["doc_id"]: r for r in score_docs(feats, w).collect()}
    assert set(got) == {1, 2}  # the empty doc still scores (bias only)


def test_validation(spark):
    from audit_star_spark.analytics.classifier import (
        hashed_features,
        train_logreg,
    )

    docs = _docs(spark, [(1, "a b")])
    ldf = spark.createDataFrame([(1, 1)], "doc_id long, label int")
    with pytest.raises(ValueError):
        hashed_features(docs, n_features=1)
    feats = hashed_features(docs, n_features=8)
    for bad_steps in (0, -1):
        with pytest.raises(ValueError):
            train_logreg(feats, ldf, steps=bad_steps)
    with pytest.raises(ValueError):
        train_logreg(feats, ldf, lr=0.0)
