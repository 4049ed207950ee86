"""Round-13 operators: ngram containment pairs (Broder asymmetric
containment), C4 sentence-span dedup (Raffel §2.2 granularity), and the
CCNet per-document disposition composition (Wenzek et al. 2020)."""

import hashlib

import pytest
from pyspark.sql import functions as F


def _shingle_set(text):
    toks = text.strip().lower().split()
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def test_containment_finds_small_in_big(spark):
    from audit_star_spark.analytics.dedup import ngram_containment_pairs

    small = "the quick brown fox jumps over the lazy dog tonight"
    big = small + " and then a very long unrelated tail keeps on going " \
                  "with words that never repeat anything from before now"
    other = "completely different content nothing shared with them at all ever"
    rows = [(1, small), (2, big), (3, other)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["containment_a_in_b"],
            r["containment_b_in_a"],
        )
        for r in ngram_containment_pairs(docs, threshold=0.8).collect()
    }
    assert set(got) == {(1, 2)}
    sa, sb = _shingle_set(small), _shingle_set(big)
    inter = len(sa & sb)
    assert got[(1, 2)] == (inter / len(sa), inter / len(sb))
    assert got[(1, 2)][0] == 1.0  # fully contained
    # Jaccard would have missed it at the same threshold
    assert inter / len(sa | sb) < 0.8


def test_containment_prefix_filter_complete(spark):
    """Brute-force parity: every pair with max-containment >= t must
    survive the asymmetric prefix filter."""
    from audit_star_spark.analytics.dedup import ngram_containment_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base + " lam mu"),
        (3, "alpha beta gamma delta epsilon zeta nu xi omicron pi rho sigma"),
        (4, "tau upsilon phi chi psi omega one two three four"),
        (5, base),  # exact duplicate of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.5
    got = {
        (r["doc_a"], r["doc_b"]) for r in
        ngram_containment_pairs(docs, threshold=t).collect()
    }
    sets = {d: _shingle_set(s) for d, s in rows}
    want = set()
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                if max(inter / len(sets[a]), inter / len(sets[b])) >= t:
                    want.add((a, b))
    assert got == want and (1, 5) in got


def test_containment_validation(spark):
    from audit_star_spark.analytics.dedup import ngram_containment_pairs

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        ngram_containment_pairs(docs, threshold=0.0)


def _span_model(pages, span=3):
    sents = {d: t.split("\n") for d, t in pages}
    spans = sorted(
        (d, p, "\n".join(ss[p : p + span]))
        for d, ss in sents.items()
        for p in range(len(ss) - span + 1)
    )
    first = {}
    for d, p, k in spans:
        first.setdefault(k, (d, p))
    removed, ndup = {}, {}
    for d, p, k in spans:
        if first[k] != (d, p):
            removed.setdefault(d, set()).update(range(p, p + span))
            ndup[d] = ndup.get(d, 0) + 1
    out = {}
    for d, ss in sents.items():
        rem = removed.get(d, set())
        kept = [s for i, s in enumerate(ss) if i not in rem]
        out[d] = (
            len(ss),
            ndup.get(d, 0),
            len(rem),
            round(len(rem) / len(ss), 6),
            hashlib.md5("\n".join(kept).encode()).hexdigest(),
        )
    return out


def test_sentence_span_dedup_matches_model(spark):
    from audit_star_spark.analytics.dedup import sentence_span_dedup

    s = [f"sentence number {i} here." for i in range(12)]
    pages = [
        (1, "\n".join(s[0:6])),
        # spans (s1,s2,s3) and (s2,s3,s4) duplicate doc 1's -> sentences
        # 1..4 of doc 2 removed, the x-lines survive
        (2, "\n".join(["x opener line."] + s[1:5] + ["x closer line."])),
        (3, "\n".join(s[6:8])),  # < span sentences: untouched
        # within-doc tandem repetition: first occurrence survives
        (4, "\n".join(s[8:11] * 3)),
        (5, "\n".join(s[0:6])),  # whole-page duplicate of doc 1
    ]
    docs = spark.createDataFrame(pages, "doc_id long, page string")
    got = {
        r["doc_id"]: (
            r["n_sentences"],
            r["n_dup_spans"],
            r["n_removed_sentences"],
            r["removed_fraction"],
            r["clean_md5"],
        )
        for r in sentence_span_dedup(docs, span=3).collect()
    }
    assert got == _span_model(pages)
    # spot invariants: doc 5 fully removed, doc 3 untouched
    assert got[5][2] == 6 and got[5][4] == hashlib.md5(b"").hexdigest()
    assert got[3][2] == 0


def test_sentence_span_dedup_validation(spark):
    from audit_star_spark.analytics.dedup import sentence_span_dedup

    docs = spark.createDataFrame([(1, "a.\nb.")], "doc_id long, page string")
    with pytest.raises(ValueError, match="span"):
        sentence_span_dedup(docs, span=0)
    with pytest.raises(ValueError, match="identifier"):
        sentence_span_dedup(docs, text_col="page; drop")


def test_ccnet_disposition_precedence_and_bins(spark):
    from audit_star_spark.analytics.lm import ccnet_disposition

    en = "the of and to in is was he for it with as his on be at by i"
    docs = spark.createDataFrame(
        [(i, "en", f"{en} filler{i} extra{i % 3} pad{i % 2}") for i in range(9)]
        + [
            (100, "en", en),          # will be duplicated by 101
            (101, "en", en),          # exact dup of 100 -> drop_duplicate
            (102, "xx", "zz qq ww rr tt yy uu ii oo pp"),  # no markers
        ],
        "doc_id long, lang string, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in ccnet_disposition(docs).collect()}
    assert len(out) == 12
    assert out[101]["disposition"] == "drop_duplicate" and out[101]["is_dup"]
    assert not out[100]["is_dup"]  # keep-first: smallest doc_id wins
    assert out[102]["pred_lang"] == "unknown"
    assert out[102]["disposition"] == "drop_lang"
    kept = [d for d, r in out.items() if r["disposition"].startswith("keep")]
    assert kept  # head + middle bins survive
    # bin semantics: head=1, tail=n_bins, and every scorable English doc
    # got a bin
    en_scored = [r for r in out.values()
                 if r["pred_lang"] == "en" and r["bin"] is not None]
    assert {r["bin"] for r in en_scored} <= {1, 2, 3}
    for r in en_scored:
        if r["is_dup"]:
            continue
        want = {1: "keep_head", 2: "keep_middle", 3: "drop_tail"}[r["bin"]]
        assert r["disposition"] == want
    # window and distributed cuts agree exactly
    w = {r["doc_id"]: tuple(r) for r in ccnet_disposition(docs, mode="window").collect()}
    d = {r["doc_id"]: tuple(r) for r in ccnet_disposition(docs, mode="distributed").collect()}
    assert w == d


def test_perplexity_bins_unchanged_by_refactor(spark):
    """perplexity_bins now delegates to perplexity_binned_docs; the
    aggregate view must equal regrouping the doc-level frame."""
    from audit_star_spark.analytics.lm import (
        perplexity_binned_docs,
        perplexity_bins,
    )

    docs = spark.createDataFrame(
        [(i, "en", f"w{i % 4} w{(i + 1) % 4} w{(i + 2) % 3} w{i % 5} end")
         for i in range(20)],
        "doc_id long, lang string, text string",
    )
    agg = {(r["lang"], r["bin"]): (r["n_docs"], r["ppl_min"], r["ppl_max"])
           for r in perplexity_bins(docs, n_bins=3).collect()}
    doc_rows = perplexity_binned_docs(docs, n_bins=3).collect()
    regroup = {}
    for r in doc_rows:
        k = (r["lang"], r["bin"])
        n, lo, hi = regroup.get(k, (0, float("inf"), float("-inf")))
        regroup[k] = (n + 1, min(lo, r["ppl6"]), max(hi, r["ppl6"]))
    assert agg == regroup


def test_containment_max_df_guard(spark):
    """The opt-in stop-shingle guard: pairs with non-hot prefix
    evidence survive; a pair whose ONLY shared shingles are hot is
    dropped from candidates (the documented recall trade-off); reported
    containments stay exact either way."""
    from audit_star_spark.analytics.dedup import ngram_containment_pairs

    hot = "common shared boiler plate words appear everywhere always"
    rows = (
        # 6 docs all containing the hot run -> its shingles have df >= 6
        [(i, hot + f" unique tail {i} zz{i}") for i in range(1, 7)]
        # a genuine near-dup pair with UNIQUE shared evidence
        + [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (11, "alpha beta gamma delta epsilon zeta eta theta iota"),
        ]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_containment_pairs(docs, threshold=0.8).collect()
    }
    guarded = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_containment_pairs(
            docs, threshold=0.8, max_df=3
        ).collect()
    }
    assert (10, 11) in exact and (10, 11) in guarded
    # hot-evidence-only pairs exist exactly and are dropped under the cap
    assert any(a < 7 and b < 7 for a, b in exact)
    assert not any(a < 7 and b < 7 for a, b in guarded)
    with pytest.raises(ValueError, match="max_df"):
        ngram_containment_pairs(docs, max_df=0)


def test_hard_negatives_numpy_parity(spark):
    """Exact parity with a numpy replay: per query, top-k cosine among
    DIFFERENT-label vectors, ties by lowest vec_id; same-label
    positives never appear."""
    import numpy as np

    from audit_star_spark.analytics.similarity import hard_negatives
    from audit_star_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = hard_negatives(emb, n_queries=4, k=5).collect()
    pdf = emb.toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=float)
            for r in pdf.itertuples()}
    labels = {int(r.vec_id): int(r.label) for r in pdf.itertuples()}
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        ql = labels[qid]
        assert all(r["query_label"] == ql for r in rows)
        assert all(r["neg_label"] != ql for r in rows)
        qv = vecs[qid] / np.linalg.norm(vecs[qid])
        cand = sorted(
            ((float(np.dot(qv, v / np.linalg.norm(v))), vid)
             for vid, v in vecs.items() if labels[vid] != ql),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        assert [r["vec_id"] for r in rows] == [vid for _c, vid in cand]
        for r, (c, _vid) in zip(rows, cand):
            assert abs(r["cosine"] - c) < 1e-9
    from pyspark.sql import functions as _F  # noqa: F401
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_queries"):
        hard_negatives(emb, n_queries=0)


def test_hard_negatives_plan_has_no_window(spark):
    """The two-phase top-k scale lock: no Window operator (a query_id-
    partitioned window would funnel each query's entire different-label
    corpus through one task) and no single-partition exchange."""
    from audit_star_spark.analytics.similarity import hard_negatives
    from audit_star_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    plan = (
        hard_negatives(emb, n_queries=4, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowExec" not in plan and " Window " not in plan
    assert "Exchange SinglePartition" not in plan
