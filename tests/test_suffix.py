"""Prefix-doubling suffix ranks (analytics/suffix.py): pure-Python
suffix-array reference parity (equal suffixes share ranks; order
matches a sorted() of the actual suffixes), window vs distributed mode
equality, the dup-profile against brute-force slice grouping, the
no-single-partition plan shape in distributed mode, and validation."""

import pytest
from pyspark.sql import functions as F

DOCS = [
    (1, "a b a b c"),
    (2, "b a b c d"),
    (3, "a b a b c"),  # exact duplicate of doc 1: every suffix shared
    (4, "z"),
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_suffixes(rows):
    out = []
    for doc_id, text in rows:
        toks = text.strip().lower().split()
        for pos in range(len(toks)):
            out.append((doc_id, pos, tuple(toks[pos:])))
    return out


def test_ranks_match_python_suffix_sort(spark):
    from audit_star_spark.analytics.suffix import suffix_ranks

    got = {
        (r["doc_id"], r["pos"]): r["rank"]
        for r in suffix_ranks(_df(spark)).collect()
    }
    suf = _py_suffixes(DOCS)
    assert set(got) == {(d, p) for d, p, _s in suf}
    # dense ranks of the sorted distinct suffixes
    distinct = sorted({s for _d, _p, s in suf})
    want_rank = {s: i + 1 for i, s in enumerate(distinct)}
    for d, p, s in suf:
        assert got[(d, p)] == want_rank[s], (d, p, s)


def test_modes_agree(spark):
    from audit_star_spark.analytics.suffix import suffix_ranks

    w = {
        (r["doc_id"], r["pos"]): r["rank"]
        for r in suffix_ranks(_df(spark), mode="window").collect()
    }
    d = {
        (r["doc_id"], r["pos"]): r["rank"]
        for r in suffix_ranks(_df(spark), mode="distributed").collect()
    }
    assert w == d


def test_dup_profile_matches_bruteforce(spark):
    from audit_star_spark.analytics.suffix import suffix_dup_profile

    rows = {
        r["h"]: (r["n_dup_suffixes"], r["n_dup_groups"])
        for r in suffix_dup_profile(_df(spark), max_h=8).collect()
    }
    suf = _py_suffixes(DOCS)
    for h in (1, 2, 4, 8):
        groups = {}
        for _d, _p, s in suf:
            groups.setdefault(s[:h], []).append(1)
        dup = [len(v) for v in groups.values() if len(v) > 1]
        assert rows[h] == (sum(dup), len(dup)), h


def test_duplicate_doc_suffixes_always_shared(spark):
    """Docs 1 and 3 are identical, so every suffix stays duplicated at
    EVERY span — the profile never reaches zero."""
    from audit_star_spark.analytics.suffix import suffix_dup_profile

    for r in suffix_dup_profile(_df(spark), max_h=16).collect():
        assert r["n_dup_suffixes"] >= 10  # 5 suffixes x 2 copies


def test_distributed_mode_has_no_single_partition_exchange(spark):
    from audit_star_spark.analytics.suffix import suffix_ranks

    plan = (
        suffix_ranks(_df(spark), mode="distributed")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan


def test_empty_corpus_raises(spark):
    from audit_star_spark.analytics.suffix import suffix_ranks

    with pytest.raises(ValueError, match="empty corpus"):
        suffix_ranks(_df(spark).filter(F.lit(False)))


def test_longest_repeated_run_matches_bruteforce(spark):
    from audit_star_spark.analytics.suffix import longest_repeated_run

    rows = [
        (1, "x y the quick brown fox z"),
        (2, "w the quick brown fox v u"),
        (3, "unrelated words here"),
        (4, "pp the quick brown fox qq"),
    ]
    got = longest_repeated_run(_df(spark, rows)).collect()[0]
    # brute force: longest list prefix shared by >= 2 suffixes
    suf = [s for _d, _p, s in _py_suffixes(rows)]
    best = (0, ())
    for i, a in enumerate(suf):
        for b in suf[i + 1 :]:
            l = 0
            while l < min(len(a), len(b)) and a[l] == b[l]:
                l += 1
            cand = (l, a[:l])
            if l > best[0] or (l == best[0] and cand[1] < best[1]):
                best = cand
    assert got["run_len"] == best[0] == 4
    assert got["run"] == " ".join(best[1]) == "the quick brown fox"
    assert got["n_occurrences"] == 3


def test_longest_run_never_materializes_suffix_arrays(spark, monkeypatch):
    """The scale lock for the LCP-from-ranks rewrite: every frame
    longest_repeated_run materializes (rank ladder, representative
    frame, LCP pair states) carries only scalar columns — the
    per-suffix token-slice frame of the first version (O(sum L_i^2)
    storage) must never come back. Also: no session-lifetime persist()
    anywhere in the module."""
    import inspect

    from pyspark.sql.types import ArrayType

    from audit_star_spark.analytics import suffix as suffix_mod

    recorded = []
    real = suffix_mod.iter_materialize

    def spy(df, *a, **kw):
        recorded.append(df.schema)
        return real(df, *a, **kw)

    monkeypatch.setattr(suffix_mod, "iter_materialize", spy)
    out = suffix_mod.longest_repeated_run(
        _df(spark, [(1, "p q r s t"), (2, "m p q r s n")]),
        mode="distributed",
    ).collect()
    assert out[0]["run"] == "p q r s"
    assert len(recorded) >= 3  # ladder rounds + rep + pair descents
    for schema in recorded:
        for f in schema.fields:
            assert not isinstance(f.dataType, ArrayType), (
                f"array column {f.name} materialized — the per-suffix "
                "slice blowup is back"
            )
    assert ".persist(" not in inspect.getsource(suffix_mod)


def test_suffix_window_keys_group_like_literal_slices(spark):
    from audit_star_spark.analytics.suffix import suffix_window_keys

    rows = DOCS + [(5, "the quick brown fox jumps over the quick brown dog")]
    for k in (2, 3, 4, 5):  # powers of two AND the overlap cases
        got = suffix_window_keys(_df(spark, rows), k).collect()
        by_key, by_slice = {}, {}
        for r in got:
            by_key.setdefault((r["r1"], r["r2"]), set()).add(
                (r["doc_id"], r["pos"])
            )
        for doc_id, text in rows:
            toks = text.strip().lower().split()
            for pos in range(len(toks) - k + 1):
                by_slice.setdefault(tuple(toks[pos: pos + k]), set()).add(
                    (doc_id, pos)
                )
        assert sorted(map(sorted, by_key.values())) == sorted(
            map(sorted, by_slice.values())
        ), k


def test_suffix_dedup_rewrite_matches_fixed_k_path(spark):
    """Drop-in parity: on a corpus with planted >= min_len duplicated
    runs (and no md5 collisions, i.e. any real corpus), the suffix-rank
    path must reproduce substring_dedup_rewrite row-for-row — including
    clean_md5, i.e. the rewritten text itself — at power-of-two AND
    overlapping window sizes, in both modes."""
    from audit_star_spark.analytics.dedup import (
        substring_dedup_rewrite,
        suffix_dedup_rewrite,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta unique one"),
        (2, "x alpha beta gamma delta epsilon zeta eta theta y"),
        (3, "p q alpha beta gamma delta epsilon zeta eta theta"),
        (4, "totally different content with no repeats at all here"),
        (5, "a a a a a a a a a a a a"),  # periodic text artifact branch
    ]
    for k in (4, 5, 8):
        want = {
            r["doc_id"]: r.asDict()
            for r in substring_dedup_rewrite(_df(spark, rows), k=k).collect()
        }
        for mode in ("window", "distributed"):
            got = {
                r["doc_id"]: r.asDict()
                for r in suffix_dedup_rewrite(
                    _df(spark, rows), min_len=k, mode=mode
                ).collect()
            }
            assert got == want, (k, mode)


def test_suffix_decontaminate_matches_fixed_k_path(spark):
    """Scrubbing parity: the suffix-rank decontamination must reproduce
    decontaminate_rewrite row-for-row (incl. clean_md5) — corpus
    occurrences of probe windows removed with NO keep-first — and
    reject negative ids (they'd collide with the probe surrogates)."""
    from audit_star_spark.analytics.dedup import (
        decontaminate_rewrite,
        suffix_decontaminate_rewrite,
    )

    corpus = [
        (1, "keep this text the secret benchmark answer is here plus more"),
        (2, "unrelated totally clean document with nothing shared at all"),
        (3, "prefix words the secret benchmark answer is here suffix words"),
    ]
    probe_rows = [(10, "the secret benchmark answer is here")]
    docs = _df(spark, corpus)
    probes = spark.createDataFrame(
        probe_rows, "probe_id long, text string"
    )
    for k in (4, 6):
        want = {
            r["doc_id"]: r.asDict()
            for r in decontaminate_rewrite(docs, probes, k=k).collect()
        }
        for mode in ("window", "distributed"):
            got = {
                r["doc_id"]: r.asDict()
                for r in suffix_decontaminate_rewrite(
                    docs, probes, min_len=k, mode=mode
                ).collect()
            }
            assert got == want, (k, mode)
    # both contaminated docs lost the 6-token probe span
    assert want[1]["n_removed_tokens"] >= 6
    assert want[3]["n_removed_tokens"] >= 6
    assert want[2]["n_removed_tokens"] == 0

    neg = spark.createDataFrame(
        [(-5, "negative id doc")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="non-negative"):
        suffix_decontaminate_rewrite(neg, probes, min_len=4).collect()


def test_longest_run_single_token_docs(spark):
    """max_len = 1 corpus: the ladder has ONE round (the final table),
    the descent set is empty after the top-round skip, and the answer
    comes entirely from the within-rank branch."""
    from audit_star_spark.analytics.suffix import longest_repeated_run

    got = longest_repeated_run(
        _df(spark, [(1, "x"), (2, "x"), (3, "y")])
    ).collect()
    assert len(got) == 1
    assert (got[0]["run_len"], got[0]["run"], got[0]["n_occurrences"]) == (
        1, "x", 2,
    )


def test_longest_run_overlapping_occurrences_ladder_count(spark):
    """run_len ~ L/2 pathological corpus: the winner is a 7-token run
    of a single repeated token with OVERLAPPING occurrences — the
    ladder-based count (h=4, d=3: the two-span join path) must count
    every starting position, and the old in-row slice-compare rescan
    must stay gone from the implementation."""
    import inspect

    from audit_star_spark.analytics.suffix import longest_repeated_run

    got = longest_repeated_run(
        _df(spark, [(1, "a a a a a a a a")]), mode="distributed"
    ).collect()
    assert len(got) == 1
    assert (got[0]["run_len"], got[0]["run"], got[0]["n_occurrences"]) == (
        7, " ".join(["a"] * 7), 2,
    )
    src = inspect.getsource(longest_repeated_run)
    assert "sequence(" not in src  # the O(L * run_len) rescan
