"""Interpolated Kneser-Ney trigram LM (analytics/lm.py
doc_perplexity_kn / train_kn_trigram_lm): a pure-Python reference model
(Chen & Goodman 1999 §2.7, derived independently from the count-table
definitions), sum-to-one over the vocabulary at every backoff level,
the out-of-domain transfer pattern from doc_perplexity, and edge
contracts (short docs, bad discount)."""

import math
import re

import pytest

D = 0.75


def _toks(text):
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


class KNModel:
    """Independent reference: identical statistics, scalar math."""

    def __init__(self, texts, d=D):
        self.d = d
        tris = {}
        vocab = set()
        for t in texts:
            tt = _toks(t)
            vocab.update(tt)
            for i in range(len(tt) - 2):
                g = (tt[i], tt[i + 1], tt[i + 2])
                tris[g] = tris.get(g, 0) + 1
        self.c3 = tris
        self.c12, self.n3f = {}, {}
        for (a, b, c), n in tris.items():
            self.c12[a, b] = self.c12.get((a, b), 0) + n
            self.n3f[a, b] = self.n3f.get((a, b), 0) + 1
        self.n1 = {}
        for (a, b, c) in tris:
            self.n1[b, c] = self.n1.get((b, c), 0) + 0
        # continuation counts: distinct a per (b, c)
        seen = {}
        for (a, b, c) in tris:
            seen.setdefault((b, c), set()).add(a)
        self.n1 = {k: len(v) for k, v in seen.items()}
        self.m, self.f2 = {}, {}
        for (b, c), n in self.n1.items():
            self.m[b] = self.m.get(b, 0) + n
            self.f2[b] = self.f2.get(b, 0) + 1
        self.n1c = {}
        for (b, c) in self.n1:
            self.n1c[c] = self.n1c.get(c, 0) + 1
        self.nb = sum(self.n1c.values())
        self.t1 = len(self.n1c)
        self.v = len(vocab)

    def p1(self, c):
        return (
            max(self.n1c.get(c, 0) - self.d, 0.0) / self.nb
            + self.d * self.t1 / self.nb / self.v
        )

    def p2(self, b, c):
        m = self.m.get(b, 0)
        if m == 0:
            return self.p1(c)
        return (
            max(self.n1.get((b, c), 0) - self.d, 0.0) / m
            + self.d * self.f2[b] / m * self.p1(c)
        )

    def p3(self, a, b, c):
        c12 = self.c12.get((a, b), 0)
        if c12 == 0:
            return self.p2(b, c)
        return (
            max(self.c3.get((a, b, c), 0) - self.d, 0.0) / c12
            + self.d * self.n3f[a, b] / c12 * self.p2(b, c)
        )

    def doc_nll(self, text):
        tt = _toks(text)
        if len(tt) < 3:
            return None, 0
        nlls = [
            -math.log(self.p3(tt[i], tt[i + 1], tt[i + 2]))
            for i in range(len(tt) - 2)
        ]
        return sum(nlls) / len(nlls), len(nlls)


TRAIN = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown cat sleeps under the warm sun",
    "a lazy dog and a quick fox share the yard",
    "the sun warms the lazy cat in the yard",
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_python_reference_model(spark):
    from audit_star_spark.analytics.lm import doc_perplexity_kn

    model = KNModel(TRAIN)
    tests = [
        (0, TRAIN[0]),                               # in-domain
        (1, "the quick brown fox sleeps in the yard"),  # mixed
        (2, "zebra xylophone quantum entropy flux"),    # fully OOV
        (3, "the quick"),                               # too short
    ]
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_nll"])
        for r in doc_perplexity_kn(
            _docs(spark, tests), train_docs=_docs(spark, list(enumerate(TRAIN)))
        ).collect()
    }
    for doc_id, text in tests:
        want_nll, want_n = KNModel(TRAIN).doc_nll(text)
        assert got[doc_id][0] == want_n, doc_id
        if want_nll is None:
            assert got[doc_id][1] is None
        else:
            assert got[doc_id][1] == pytest.approx(want_nll, rel=1e-12), doc_id
    del model


def test_every_level_sums_to_one_over_vocab(spark):
    """The normalization identity interpolated KN is built on: for any
    context, the next-token distribution sums to 1 over the training
    vocabulary — seen trigram context, seen-bigram-only context, and
    the unigram base case alike. Scalar check on the reference model
    (the Spark build shares the count tables by the parity test)."""
    m = KNModel(TRAIN)
    vocab = set()
    for t in TRAIN:
        vocab.update(_toks(t))
    assert sum(m.p1(c) for c in vocab) == pytest.approx(1.0, abs=1e-12)
    for b in ["the", "quick", "lazy"]:
        assert sum(m.p2(b, c) for c in vocab) == pytest.approx(1.0, abs=1e-12)
    for (a, b) in [("the", "quick"), ("lazy", "dog"), ("a", "quick")]:
        assert sum(m.p3(a, b, c) for c in vocab) == pytest.approx(1.0, abs=1e-12)


def test_transfer_flags_out_of_domain(spark):
    """The filter's point: out-of-domain text must score strictly higher
    perplexity than in-domain text under a model trained on the domain
    (the doc_perplexity transfer pattern at trigram order)."""
    from audit_star_spark.analytics.lm import doc_perplexity_kn

    train = _docs(spark, [(i, t) for i, t in enumerate(TRAIN * 3)])
    test = _docs(
        spark,
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "zebra xylophone quantum entropy flux capacitor"),
        ],
    )
    got = {
        r["doc_id"]: r["perplexity"]
        for r in doc_perplexity_kn(test, train_docs=train).collect()
    }
    assert got[101] > got[100] * 3


def test_short_docs_keep_null_scores(spark):
    from audit_star_spark.analytics.lm import doc_perplexity_kn

    out = {
        r["doc_id"]: (r["n_trigrams"], r["avg_nll"])
        for r in doc_perplexity_kn(
            _docs(spark, [(1, "one two"), (2, "one two three four")])
        ).collect()
    }
    assert out[1] == (0, None)
    assert out[2][0] == 2 and out[2][1] is not None


def test_rejects_bad_discount(spark):
    from audit_star_spark.analytics.lm import doc_perplexity_kn

    docs = _docs(spark, [(1, "a b c")])
    for bad in (0.0, 1.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            doc_perplexity_kn(docs, discount=bad)
