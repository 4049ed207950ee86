"""BM25 retrieval and bigram-LM perplexity: known-answer math on a tiny
corpus, ranking properties, degenerate inputs, and the scale plan shapes
(top-k as TakeOrderedAndProject, no Python in either pipeline)."""

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------------ BM25
def test_bm25_known_answer_hand_computed(spark):
    """3-doc corpus, single-term query — score must equal the formula
    evaluated by hand."""
    from audit_star_spark.analytics.search import bm25_topk

    docs = _docs(
        spark,
        [
            (1, "spark spark join"),  # tf=2, dl=3
            (2, "join merge sort"),  # no match
            (3, "spark"),  # tf=1, dl=1
        ],
    )
    got = {r["doc_id"]: r for r in bm25_topk(docs, ["spark"], k=5).collect()}
    n, avgdl, df, k1, b = 3, 7 / 3, 2, 1.2, 0.75
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

    def score(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert set(got) == {1, 3}
    assert got[1]["score"] == pytest.approx(score(2, 3), rel=1e-12)
    assert got[3]["score"] == pytest.approx(score(1, 1), rel=1e-12)
    assert got[1]["n_matched"] == 1


def test_bm25_multi_term_and_tie_break(spark):
    """Rarer terms score higher (IDF); ties break by doc_id ascending;
    duplicate query terms fold to set semantics."""
    from audit_star_spark.analytics.search import bm25_topk

    docs = _docs(
        spark,
        [
            (1, "rare common"),
            (2, "common common"),
            (3, "common rare"),
            (4, "common filler"),
        ],
    )
    rows = bm25_topk(docs, ["rare", "common", "common"], k=10).collect()
    assert [r["doc_id"] for r in rows[:2]] == [1, 3]  # rare beats common
    assert rows[0]["score"] == pytest.approx(rows[1]["score"], rel=1e-12)
    assert rows[0]["n_matched"] == 2
    assert len(rows) == 4


def test_bm25_k_limits_and_validation(spark):
    from audit_star_spark.analytics.search import bm25_topk

    docs = _docs(spark, [(i, "hit word") for i in range(9)])
    assert bm25_topk(docs, ["hit"], k=4).count() == 4
    with pytest.raises(ValueError, match="at least one"):
        bm25_topk(docs, [])
    with pytest.raises(ValueError, match="positive"):
        bm25_topk(docs, ["hit"], k=0)


def test_bm25_plan_is_takeordered_no_python(spark):
    """Top-k must compile to TakeOrderedAndProject (never a global Sort
    of the corpus) and the whole pipeline stays JVM-side."""
    from audit_star_spark.analytics.search import bm25_topk
    from audit_star_spark.sources.testdata import load_table

    df = bm25_topk(load_table(spark, SF_DIR, "documents"), ["spark"], k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Python" not in plan, plan


# ----------------------------------------------------------- perplexity
def test_perplexity_known_answer_hand_computed(spark):
    """Two tiny docs, self-trained: every smoothed probability checked
    against the closed form."""
    from audit_star_spark.analytics.lm import doc_perplexity

    docs = _docs(spark, [(1, "a b a b"), (2, "a b")])
    # corpus: bigrams (a,b)x2 from doc1 + (b,a)x1 + (a,b)x1 from doc2
    # unigrams: a=4? doc1 has a,b,a,b (a=2,b=2); doc2 a,b (a=1,b=1)
    # => c(a)=3, c(b)=3, V=2, k=0.5
    # c(ab)=3, c(ba)=1
    k, v = 0.5, 2
    p_ab = (3 + k) / (3 + k * v)
    p_ba = (1 + k) / (3 + k * v)
    got = {r["doc_id"]: r for r in doc_perplexity(docs).collect()}
    nll1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    nll2 = -math.log(p_ab)
    assert got[1]["n_bigrams"] == 3
    assert got[1]["avg_nll"] == pytest.approx(nll1, rel=1e-12)
    assert got[1]["perplexity"] == pytest.approx(math.exp(nll1), rel=1e-12)
    assert got[2]["avg_nll"] == pytest.approx(nll2, rel=1e-12)


def test_perplexity_short_docs_keep_null_scores(spark):
    from audit_star_spark.analytics.lm import doc_perplexity

    docs = _docs(spark, [(1, "solo"), (2, "two words")])
    got = {r["doc_id"]: r for r in doc_perplexity(docs).collect()}
    assert got[1]["n_bigrams"] == 0 and got[1]["perplexity"] is None
    assert got[2]["n_bigrams"] == 1 and got[2]["perplexity"] is not None


def test_perplexity_transfer_flags_out_of_domain(spark):
    """Train on an in-domain corpus, score held-out docs: the
    out-of-domain document (unseen bigrams) must score strictly higher
    perplexity than the in-domain one."""
    from audit_star_spark.analytics.lm import doc_perplexity

    train = _docs(
        spark, [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
    )
    test = _docs(
        spark,
        [
            (100, "the quick brown fox"),  # in-domain
            (101, "zebra xylophone quantum entropy"),  # out-of-domain
        ],
    )
    got = {
        r["doc_id"]: r["perplexity"]
        for r in doc_perplexity(test, train_docs=train).collect()
    }
    # unseen-context probability is 1/V, so out-of-domain perplexity
    # saturates at V (=8 here) — assert a clear margin, not a huge one
    assert got[101] == pytest.approx(8.0, rel=1e-9)  # fully out-of-domain
    assert got[101] > got[100] * 3


def test_perplexity_rejects_bad_smoothing(spark):
    from audit_star_spark.analytics.lm import doc_perplexity

    with pytest.raises(ValueError, match="positive"):
        doc_perplexity(_docs(spark, [(1, "a b")]), add_k=0)


def test_perplexity_plan_no_python(spark):
    from audit_star_spark.analytics.lm import doc_perplexity
    from audit_star_spark.sources.testdata import load_table

    df = doc_perplexity(load_table(spark, SF_DIR, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan


def test_bm25_single_scan_plan_lock(spark):
    """bm25_topk must tokenize the corpus exactly once: the slim
    (doc_id, dl, tf_i...) projection is lazily localCheckpointed, so the
    final plan's two consumers (stats broadcast + scoring) both read the
    checkpointed blocks — NO parquet scan of documents remains in the
    executed plan. The old design branched the exploded token stream and
    paid two to three full scan+tokenize passes."""
    from audit_star_spark.analytics.search import bm25_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t = bm25_topk(docs, ["data", "model"], k=5)
    assert t.count() == 5
    plan = t._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "Scan parquet" not in plan, plan
    assert "ExistingRDD" in plan, plan


def test_bm25_empty_token_docs_excluded_from_corpus_stats(spark):
    """ADVICE r8: a caller-supplied tokens_expr that yields an empty
    array must not inflate N/avgdl — the explode-based oracle drops
    such docs from `lengths`, so scores must equal the corpus with the
    empty doc absent."""
    from audit_star_spark.analytics.search import bm25_topk

    expr = "filter(split(lower(text), ' '), x -> x != '')"
    docs = spark.createDataFrame(
        [(1, "apple banana"), (2, "apple apple"), (3, "")],
        "doc_id long, text string",
    )
    with_empty = sorted(
        map(tuple, bm25_topk(docs, ["apple"], k=5, tokens_expr=expr).collect())
    )
    without = sorted(
        map(
            tuple,
            bm25_topk(
                docs.filter("doc_id != 3"), ["apple"], k=5, tokens_expr=expr
            ).collect(),
        )
    )
    assert with_empty == without and len(with_empty) == 2


def test_hybrid_rrf_fusion_arithmetic(spark):
    """RRF semantics on a planted corpus: a doc in both lists scores
    1/(60+r_lex) + 1/(60+r_sem); single-list docs score one term; the
    fused order follows those sums with doc_id tie-breaks."""
    from audit_star_spark.analytics.search import hybrid_rrf_topk

    docs = spark.createDataFrame(
        [
            (0, "query anchor row"),          # vec query id 0
            (1, "spark spark spark spark"),   # lexical hit, strong
            (2, "spark window"),              # lexical hit, weaker
            (3, "nothing relevant here"),     # semantic-only candidate
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, "a", [1.0, 0.0]),
            (1, "a", [0.0, 1.0]),    # orthogonal to query
            (2, "a", [0.9, 0.1]),    # close
            (3, "a", [1.0, 0.05]),   # closest
        ],
        "vec_id long, label string, embedding array<double>",
    )
    got = {
        r["doc_id"]: r
        for r in hybrid_rrf_topk(
            docs, emb, ["spark", "window"], query_vec_id=0, k=4, pool=4
        ).collect()
    }
    # lexical ranks: doc 2 matches both terms (higher bm25), doc 1 one
    # term repeated; semantic ranks by cosine: 3, 2, 1
    assert got[3]["r_lex"] is None and got[3]["r_sem"] == 1
    assert got[1]["r_sem"] == 3
    for d, row in got.items():
        want = 0.0
        if row["r_lex"] is not None:
            want += 1.0 / (60 + row["r_lex"])
        if row["r_sem"] is not None:
            want += 1.0 / (60 + row["r_sem"])
        assert abs(row["rrf"] - round(want, 9)) < 1e-12, d
    # three candidate docs fuse (doc 0 is the query: no term match, and
    # the semantic list excludes self); ranking follows the sums
    assert set(got) == {1, 2, 3}
    order = sorted(got.values(), key=lambda r: (-r["rrf"], r["doc_id"]))
    assert [r["rank"] for r in order] == [1, 2, 3]
