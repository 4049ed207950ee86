"""Quality-layer tests: property-based checks of the repetition stats and
PII scan against pure-Python models, entropy invariants, and structural
invariants of the SemDeDup keep/drop policy.

Model-based style mirrors tests/test_maps_properties.py: one batched
DataFrame per hypothesis case (one Spark job for all examples)."""

import math
import re
from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from audit_star_spark.analytics.quality import (
    with_char_entropy,
    with_pii_scan,
    with_repetition_stats,
)

TOKEN = st.sampled_from(["aa", "bb", "ccc", "d", "ee", "fff"])
DOC = st.lists(TOKEN, min_size=3, max_size=30)


def _model_rep(tokens: list[str]) -> dict:
    def grams(n):
        return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]

    def top_frac(n):
        c = Counter(grams(n))
        mass = {g: cnt * len(g) for g, cnt in c.items()}
        return max(mass.values()) / sum(mass.values())

    c3 = Counter(grams(3))
    mass3 = {g: cnt * len(g) for g, cnt in c3.items()}
    dup3 = sum(m for g, m in mass3.items() if c3[g] > 1) / sum(mass3.values())
    return {
        "n_tokens": len(tokens),
        "n_distinct_tokens": len(set(tokens)),
        "top_1gram_char_frac": top_frac(1),
        "top_2gram_char_frac": top_frac(2),
        "dup_3gram_char_frac": dup3,
    }


@settings(max_examples=25, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=20))
def test_repetition_stats_match_python_model(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in with_repetition_stats(df).collect()}
    for i, toks in enumerate(docs):
        want = _model_rep(toks)
        got = out[i]
        for k, v in want.items():
            assert math.isclose(got[k], v, rel_tol=1e-9), (k, got[k], v, toks)


PII_RE = {
    "n_emails": re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    "n_phones": re.compile(r"\(\d{3}\) \d{3}-\d{4}"),
    "n_ips": re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
}

FRAGMENT = st.sampled_from(
    [
        "plain words here",
        "bob@example.com",
        "a.b@mail.co",
        "(555) 123-4567",
        "10.0.0.1",
        "192.168.300.1",  # still 4 dotted number groups -> counts as IP-shaped
        "not@an@email",
        "(55) 123-4567",
        "1.2.3",
    ]
)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(FRAGMENT, min_size=1, max_size=6), min_size=1, max_size=15))
def test_pii_scan_matches_re_model(spark, docs):
    rows = [(i, " ".join(frags)) for i, frags in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in with_pii_scan(df).collect()}
    for i, _ in enumerate(docs):
        text = rows[i][1]
        got = out[i]
        for col, rx in PII_RE.items():
            assert got[col] == len(rx.findall(text)), (col, text, got[col])
        red = PII_RE["n_emails"].sub("<EMAIL>", text)
        red = PII_RE["n_phones"].sub("<PHONE>", red)
        red = PII_RE["n_ips"].sub("<IP>", red)
        assert got["redacted_len"] == len(red), (text, red)


def test_char_entropy_bounds_and_degenerate_doc(spark):
    df = spark.createDataFrame(
        [(0, "aaaaaaaa"), (1, "abababab"), (2, "abcdefgh")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in with_char_entropy(df).collect()}
    assert out[0]["char_entropy"] == 0.0  # single repeated char
    assert math.isclose(out[1]["char_entropy"], math.log(2), rel_tol=1e-9)
    assert math.isclose(out[2]["char_entropy"], math.log(8), rel_tol=1e-9)
    for r in out.values():  # 0 <= H <= ln(n_chars)
        assert -1e-12 <= r["char_entropy"] <= math.log(r["n_chars"]) + 1e-12


def test_char_entropy_empty_text_emits_no_row(spark):
    """Spark's sequence(1, 0) is the DESCENDING [1, 0]; unguarded it
    fabricates a phantom (n_chars=2, H=0) row for empty text while the
    DuckDB oracle's generate_series(1, 0) emits nothing. Empty docs must
    vanish on both engines."""
    df = spark.createDataFrame(
        [(0, ""), (1, "ab")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in with_char_entropy(df).collect()}
    assert set(out) == {1}
    assert out[1]["n_chars"] == 2


def test_quality_flags_keep_is_conjunction(spark):
    from audit_star_spark.queries_analytics import q_quality_flags

    rows = q_quality_flags(spark, "/root/testdata/sf0.001").collect()
    assert rows
    flags = ["ok_length", "ok_avg_token_len", "ok_stopwords", "ok_diversity", "ok_repetition"]
    for r in rows:
        assert r["keep"] == all(r[f] for f in flags)
    assert any(not r["keep"] for r in rows)  # gate is non-trivial on testdata
    assert any(r["keep"] for r in rows)


def test_semantic_dedup_invariants(spark):
    from audit_star_spark.queries_analytics import q_semantic_dedup
    from audit_star_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    out = q_semantic_dedup(spark, sf)
    rows = out.collect()
    n_vecs = load_table(spark, sf, "embeddings").count()
    assert len(rows) == n_vecs  # exactly one verdict per vector
    cell = {r["vec_id"]: r["cell_id"] for r in rows}
    for r in rows:
        if r["kept"]:
            assert r["dup_of"] is None
        else:
            # dropped vector points at a lower-id near-dup in the SAME cell
            assert r["dup_of"] is not None and r["dup_of"] < r["vec_id"]
            assert cell[r["dup_of"]] == r["cell_id"]
    assert any(not r["kept"] for r in rows)


def test_compression_ratio_orders_text_by_compressibility(spark):
    """Repetitive text compresses far below natural-ish text, which
    compresses below random noise; ratios are deterministic."""
    import random

    random.seed(3)
    noise = "".join(chr(random.randrange(33, 127)) for _ in range(2000))
    rows = [
        (1, "spam ham " * 250),
        (2, "the quick brown fox jumps over the lazy dog and then rests " * 33),
        (3, noise),
        (4, ""),
    ]
    from audit_star_spark.analytics.quality import compression_ratio

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert got[1]["zlib_ratio"] < got[2]["zlib_ratio"] < got[3]["zlib_ratio"]
    assert got[3]["zlib_ratio"] > 0.7  # noise barely compresses
    assert got[1]["zlib_ratio"] < 0.1  # pure repetition collapses
    assert got[4]["zlib_ratio"] is None and got[4]["n_raw_bytes"] == 0
    # deterministic across runs
    again = {r["doc_id"]: r["zlib_ratio"] for r in compression_ratio(docs).collect()}
    assert again == {k: v["zlib_ratio"] for k, v in got.items()}


def test_c4_line_clean_rules(spark):
    """Raffel et al. 2020 §2.2 rule-by-rule: terminal punctuation,
    min words per line, min kept lines, lorem-ipsum and curly-brace
    page drops, and the rewritten-text md5 of surviving pages."""
    import hashlib

    from audit_star_spark.analytics.quality import c4_line_clean

    good = "one two three four five.\nsix seven eight nine ten!\n" \
           'eleven twelve thirteen fourteen fifteen?"\n' \
           "sixteen seventeen eighteen nineteen twenty.\n" \
           "alpha beta gamma delta epsilon!"
    # line 2 lacks terminal punct, line 3 has only 4 words
    partial = "a b c d e.\nno terminal punctuation here at all\n" \
              "too few words."
    lorem = good + "\nLorem Ipsum dolor sit amet."
    brace = good + "\nvar x = { a: 1 };"
    # well-formed (5+ words, terminal '.') but contains 'javascript' —
    # the §2.2 line-blockword rule must drop JUST that line
    js = good + "\nplease click to enable JavaScript support."
    rows = [(1, good), (2, partial), (3, brace), (4, lorem), (5, js)]
    out = {
        r["doc_id"]: r.asDict()
        for r in c4_line_clean(
            spark.createDataFrame(rows, "doc_id long, page string")
        ).collect()
    }
    assert out[1]["kept"] and out[1]["n_kept_lines"] == 5
    assert out[1]["drop_reason"] is None
    assert out[1]["clean_md5"] == hashlib.md5(good.encode()).hexdigest()
    assert not out[2]["kept"] and out[2]["drop_reason"] == "too_few_lines"
    assert out[2]["n_lines"] == 3 and out[2]["n_kept_lines"] == 1
    assert out[2]["clean_md5"] is None
    # blocklist fires on the PAGE even though enough lines survive
    assert not out[3]["kept"] and out[3]["drop_reason"] == "blocklist"
    assert not out[4]["kept"] and out[4]["drop_reason"] == "blocklist"
    # javascript line dropped at LINE level; rest of the page survives
    assert out[5]["kept"] and out[5]["n_kept_lines"] == 5
    assert out[5]["n_lines"] == 6
    assert out[5]["clean_md5"] == hashlib.md5(good.encode()).hexdigest()
    # paper-text reading still available via the knobs
    relaxed = {
        r["doc_id"]: r.asDict()
        for r in c4_line_clean(
            spark.createDataFrame(rows, "doc_id long, page string"),
            min_words_per_line=3,
            min_lines=3,
        ).collect()
    }
    # 'too few words.' (3 words) now passes the line rule, but only 2
    # lines survive, still under min_lines=3
    assert not relaxed[2]["kept"] and relaxed[2]["n_kept_lines"] == 2
    # blocklist phrases with quotes must not break expression parsing
    quoted = c4_line_clean(
        spark.createDataFrame(rows, "doc_id long, page string"),
        blocklist=("it's a trap", "{"),
    ).collect()
    assert len(quoted) == 5
    import pytest as _pytest

    with _pytest.raises(ValueError, match="plain identifier"):
        c4_line_clean(
            spark.createDataFrame(rows, "doc_id long, page string"),
            text_col="page; drop table",
        )
