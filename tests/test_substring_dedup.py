"""Exact-substring dedup WITH REMOVAL (analytics/dedup.py
substring_dedup_rewrite — the Lee et al. 2022 ExactSubstr granularity):
known-answer tests with planted duplicated runs, plus a hypothesis model
test of the full semantics (overlapping window hashes, global keep-first
rank, interval merge, indexed rewrite). The DuckDB oracle checks engine
parity in test_oracle_parity; these check the SEMANTICS."""

import hashlib
import re

from hypothesis import given, settings, strategies as st

K = 4  # small window so tiny docs exercise every path


def _toks(text: str) -> list[str]:
    # exactly TOKENS_EXPR: collapse whitespace, lower, split on ' '
    # ('' -> [''] — one empty token, same as Spark's split)
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def _model(docs: dict[int, str], k: int) -> dict[int, dict]:
    toks = {i: _toks(t) for i, t in docs.items()}
    first: set[tuple] = set()
    removed: dict[int, list[int]] = {i: [] for i in toks}
    for i in sorted(toks):
        tt = toks[i]
        for pos in range(len(tt) - k + 1):
            key = tuple(tt[pos : pos + k])
            if key in first:
                removed[i].append(pos)
            else:
                first.add(key)
    out = {}
    for i, tt in toks.items():
        spans: list[list[int]] = []
        for pos in removed[i]:
            if spans and pos <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], pos + k)
            else:
                spans.append([pos, pos + k])
        covered = set()
        for s, e in spans:
            covered.update(range(s, e))
        clean = [t for j, t in enumerate(tt) if j not in covered]
        out[i] = {
            "n_tokens": len(tt),
            "n_dup_spans": len(spans),
            "n_removed_tokens": sum(e - s for s, e in spans),
            "clean": " ".join(clean),
        }
    return out


def _run(spark, docs: dict[int, str], k: int = K) -> dict[int, dict]:
    from audit_star_spark.analytics.dedup import substring_dedup_rewrite

    df = spark.createDataFrame(
        sorted(docs.items()), "doc_id long, text string"
    )
    return {
        r["doc_id"]: {
            "n_tokens": r["n_tokens"],
            "n_dup_spans": r["n_dup_spans"],
            "n_removed_tokens": r["n_removed_tokens"],
            "clean_md5": r["clean_md5"],
        }
        for r in substring_dedup_rewrite(df, k=k).collect()
    }


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_planted_duplicate_removed_from_later_doc_only(spark):
    boiler = "all rights reserved contact us for more details"  # 8 toks
    docs = {
        1: f"alpha beta gamma delta {boiler}",
        2: f"unique opening words here {boiler} and a distinct tail too",
    }
    got = _run(spark, docs, k=8)
    # doc 1 is canonical: nothing removed, clean == its own text
    assert got[1]["n_removed_tokens"] == 0
    assert got[1]["clean_md5"] == _md5(_toks(docs[1]) and " ".join(_toks(docs[1])))
    # doc 2 loses exactly the 8-token boilerplate run
    assert got[2]["n_dup_spans"] == 1
    assert got[2]["n_removed_tokens"] == 8
    expect2 = "unique opening words here and a distinct tail too"
    assert got[2]["clean_md5"] == _md5(expect2)


def test_short_doc_and_unique_docs_untouched(spark):
    docs = {1: "tiny doc", 2: "one two three", 3: "wholly unique longer document body"}
    got = _run(spark, docs, k=8)
    for i, t in docs.items():
        assert got[i]["n_removed_tokens"] == 0
        assert got[i]["clean_md5"] == _md5(" ".join(_toks(t)))


def test_within_doc_repetition_removed(spark):
    para = "the quick brown fox jumps over lazy dogs"  # 8 toks
    docs = {1: f"{para} interlude words {para}"}
    got = _run(spark, docs, k=8)
    assert got[1]["n_removed_tokens"] == 8
    assert got[1]["clean_md5"] == _md5(f"{para} interlude words")


def test_full_duplicate_doc_collapses_to_empty(spark):
    t = "a fully duplicated document of exactly nine tokens"
    got = _run(spark, {1: t, 2: t}, k=8)
    assert got[1]["n_removed_tokens"] == 0
    assert got[2]["n_removed_tokens"] == got[2]["n_tokens"]
    assert got[2]["clean_md5"] == _md5("")


def test_periodic_text_artifact_is_the_documented_one(spark):
    # self-overlapping repeats: every window after pos 0 duplicates the
    # first, so the merged span [1, n) leaves only the first TOKEN —
    # the documented aggressive window-level ExactSubstr artifact
    docs = {1: " ".join(["spam"] * 12)}
    got = _run(spark, docs, k=4)
    assert got[1]["n_removed_tokens"] == 11
    assert got[1]["clean_md5"] == _md5("spam")


def test_preserve_case_rewrite_keeps_original_casing(spark):
    """The pipeline path (preserve_case=True): duplicates are matched
    case-insensitively, but the rewritten text keeps the survivors'
    ORIGINAL case — only trim + whitespace-collapse is applied (the
    documented token-granularity normalization)."""
    from audit_star_spark.analytics.dedup import substring_dedup_rewrite

    boiler = "All Rights Reserved Contact Us For More Details"  # 8 toks
    docs = {
        1: f"Alpha Beta GAMMA delta {boiler.lower()}",
        2: f"Unique OPENING Words here   {boiler} and a Distinct tail too",
    }
    df = spark.createDataFrame(sorted(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in substring_dedup_rewrite(
            df, k=8, emit_text=True, preserve_case=True
        ).collect()
    }
    # doc 1 canonical: untouched, original casing kept, whitespace normal
    assert got[1]["clean_text"] == f"Alpha Beta GAMMA delta {boiler.lower()}"
    # doc 2: the boilerplate matched despite the case difference (the
    # canonical-token hash), and the survivors keep THEIR casing
    assert got[2]["n_removed_tokens"] == 8
    assert got[2]["clean_text"] == "Unique OPENING Words here and a Distinct tail too"
    # clean_md5 is over the same case-preserved rewrite in this mode
    assert got[2]["clean_md5"] == _md5(got[2]["clean_text"])


WORD = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
DOC = st.lists(WORD, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=8))
def test_matches_pure_python_model(spark, texts):
    docs = dict(enumerate(texts))
    got = _run(spark, docs, k=K)
    want = _model(docs, k=K)
    assert set(got) == set(want)
    for i in want:
        assert got[i]["n_tokens"] == want[i]["n_tokens"], i
        assert got[i]["n_dup_spans"] == want[i]["n_dup_spans"], i
        assert got[i]["n_removed_tokens"] == want[i]["n_removed_tokens"], i
        assert got[i]["clean_md5"] == _md5(want[i]["clean"]), i


def test_decontaminate_rewrite_scrubs_probe_spans(spark):
    """Every corpus occurrence of a probe window is removed (no
    keep-first); the probe doc itself scrubs to empty."""
    from audit_star_spark.analytics.dedup import decontaminate_rewrite

    bench = "what is the capital of france answer paris"  # 8 toks
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {bench} outro words here"),
            (2, "completely unrelated content of similar length here"),
            (3, bench),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, bench)], "probe_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in decontaminate_rewrite(docs, probes, k=8, emit_text=True).collect()
    }
    assert got[1]["n_removed_tokens"] == 8
    assert got[1]["clean_text"] == "intro words here outro words here"
    assert got[2]["n_removed_tokens"] == 0
    assert got[3]["n_removed_tokens"] == 8 and got[3]["clean_text"] == ""
