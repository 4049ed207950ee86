"""robots.txt evaluation (analytics/robots.py): RFC 9309 parsing, group
selection, longest-match precedence, wildcard/anchor semantics, and the
Spark verdict operator."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from audit_star_spark.analytics.robots import (
    parse_robots_rules,
    robots_pattern_to_regex,
    robots_verdicts,
)

ROBOTS = """\
# test file
User-agent: auditbot
Disallow: /

User-agent: *
Disallow: /private/*
Allow: /private/open
Disallow: /exact$
Crawl-delay: 3
Sitemap: https://x.test/sitemap.xml
"""


def test_group_selection_exact_vs_star():
    star = parse_robots_rules(ROBOTS, agent="*")
    assert (False, "/private/*") in star and (True, "/private/open") in star
    assert (False, "/") not in star
    bot = parse_robots_rules(ROBOTS, agent="AuditBot")
    assert bot == [(False, "/")]


def test_groups_merge_and_rules_restart_group():
    txt = (
        "User-agent: a\nDisallow: /x\n"
        "User-agent: a\nAllow: /y\n"        # second group, same token
        "User-agent: b\nDisallow: /z\n"
    )
    assert parse_robots_rules(txt, "a") == [(False, "/x"), (True, "/y")]
    assert parse_robots_rules(txt, "b") == [(False, "/z")]


def test_empty_disallow_means_allow_everything():
    txt = "User-agent: *\nDisallow:\n"
    assert parse_robots_rules(txt) == []


def test_pattern_regex_translation():
    assert robots_pattern_to_regex("/a/*") == "^/a/.*"
    assert robots_pattern_to_regex("/a$") == "^/a$"
    assert robots_pattern_to_regex("/p$q") == r"^/p\$q"
    assert robots_pattern_to_regex("/a.b+c") == r"^/a\.b\+c"
    import re

    assert re.search(robots_pattern_to_regex("/a/*"), "/a/b/c")
    assert re.search(robots_pattern_to_regex("/a$"), "/a")
    assert not re.search(robots_pattern_to_regex("/a$"), "/ab")


def test_verdicts_longest_match_and_defaults(spark):
    robots = spark.createDataFrame(
        [
            ("d1", ROBOTS),
            ("d2", "User-agent: *\nDisallow: /\nAllow: /pub\n"),
        ],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (1, "d1", "/private/secret"),   # disallow /private/*
            (2, "d1", "/private/open"),     # allow beats shorter disallow
            (3, "d1", "/exact"),            # anchored disallow
            (4, "d1", "/exactmore"),        # anchor does NOT match
            (5, "d1", "/other"),            # no rule -> default allow
            (6, "d2", "/anything"),         # disallow /
            (7, "d2", "/pub/x"),            # allow /pub (longer)
            (8, "d3", "/no/robots"),        # no robots.txt at all
        ],
        "url_id long, domain string, path string",
    )
    got = {
        r["url_id"]: (r["allowed"], r["rule_pattern"])
        for r in robots_verdicts(urls, robots).collect()
    }
    assert got[1] == (False, "/private/*")
    assert got[2] == (True, "/private/open")
    assert got[3] == (False, "/exact$")
    assert got[4] == (True, None)
    assert got[5] == (True, None)
    assert got[6] == (False, "/")
    assert got[7] == (True, "/pub")
    assert got[8] == (True, None)


def test_tie_between_allow_and_disallow_goes_to_allow(spark):
    robots = spark.createDataFrame(
        [("d", "User-agent: *\nDisallow: /ab\nAllow: /ab\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "d", "/abc")], "url_id long, domain string, path string"
    )
    row = robots_verdicts(urls, robots).collect()[0]
    assert row["allowed"] is True and row["rule_pattern"] == "/ab"


def test_precedence_is_octet_length_not_characters(spark):
    """RFC 9309 most-specific = longest in OCTETS. Two wildcard rules
    match the same path: Allow '/p*テス' is 5 characters but 9 UTF-8
    octets; Disallow '/p*ab/a' is 7 characters and 7 octets. Octet
    precedence picks Allow (9 > 7); character precedence would wrongly
    pick Disallow (7 > 5)."""
    robots = spark.createDataFrame(
        [("d", "User-agent: *\nAllow: /p*テス\nDisallow: /p*ab/a\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "d", "/pab/aテス")],
        "url_id long, domain string, path string",
    )
    row = robots_verdicts(urls, robots).collect()[0]
    assert row["allowed"] is True
    assert row["rule_pattern"] == "/p*テス"


def test_verdicts_single_url_scan_no_anti_join(spark):
    """The crawl-by-default restore must NOT rescan the URL side: one
    left broadcast join + one url-keyed window, no second join back
    (the r9 anti-join shape). Locked via the executed plan: exactly one
    scan of the urls source and no BroadcastHashJoin LeftAnti."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, "d" if i % 2 else "nodomain", "/x") for i in range(10)],
            "url_id long, domain string, path string",
        ).write.mode("overwrite").parquet(f"{td}/urls")
        urls = spark.read.parquet(f"{td}/urls")
        robots = spark.createDataFrame(
            [("d", "User-agent: *\nDisallow: /x\n")],
            "domain string, robots_txt string",
        )
        out = robots_verdicts(urls, robots)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count(f"{td}/urls") <= 1 or plan.lower().count("scan parquet") <= 1
        assert "LeftAnti" not in plan
        got = {r["url_id"]: r["allowed"] for r in out.collect()}
        assert all(got[i] is True for i in range(0, 10, 2))  # no rules
        assert all(got[i] is False for i in range(1, 10, 2))  # disallowed


def test_poison_robots_degrades_to_allow(spark):
    robots = spark.createDataFrame(
        [("d", None)], "domain string, robots_txt string"
    )
    urls = spark.createDataFrame(
        [(1, "d", "/x")], "url_id long, domain string, path string"
    )
    row = robots_verdicts(urls, robots).collect()[0]
    assert row["allowed"] is True


from hypothesis import given, settings, strategies as st  # noqa: E402

PATH_CHARS = st.sampled_from(list("/abc123.*$+?x"))
PATTERN = st.text(alphabet=PATH_CHARS, min_size=1, max_size=12)
PATH = st.text(alphabet=PATH_CHARS, min_size=0, max_size=16).map(
    lambda s: "/" + s
)


@settings(max_examples=200, deadline=None)
@given(PATTERN, PATH)
def test_regex_translation_matches_reference_matcher(pattern, path):
    """The regex translation must agree with a direct RFC 9309 matcher
    (greedy * = any sequence, trailing $ = end anchor, all else
    literal) on arbitrary pattern/path pairs — including patterns full
    of regex metacharacters."""
    import re

    def ref_match(pat: str, p: str) -> bool:
        anchored = pat.endswith("$")
        body = pat[:-1] if anchored else pat
        parts = body.split("*")

        # prefix must match at 0
        if not p.startswith(parts[0]):
            return False
        i = len(parts[0])
        for seg in parts[1:-1] if len(parts) > 1 else []:
            j = p.find(seg, i)
            if j < 0:
                return False
            i = j + len(seg)
        if len(parts) > 1:
            last = parts[-1]
            if anchored:
                return p.endswith(last) and len(p) - len(last) >= i
            j = p.find(last, i)
            return j >= 0
        return p == body if anchored else True

    from audit_star_spark.analytics.robots import robots_pattern_to_regex

    got = re.search(robots_pattern_to_regex(pattern), path) is not None
    assert got == ref_match(pattern, path), (pattern, path)
