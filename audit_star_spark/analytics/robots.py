"""robots.txt evaluation (RFC 9309) — the crawl pipeline's URL gate.

A crawl corpus is only usable if the pipeline can PROVE which URLs its
robots policy allowed; re-filtering a 100 TB crawl against the fetched
robots.txt set is a standard compliance/debug sweep. This module
implements the RFC 9309 core:

- group selection: the group whose ``User-agent`` token equals the
  product token (case-insensitive), else the ``*`` group; multiple
  groups for the same token merge;
- rule matching: byte-wise path match where ``*`` matches any sequence
  and a trailing ``$`` anchors the end; the MOST SPECIFIC matching rule
  (longest pattern, in octets) wins, ties break to ``allow``;
- no matching rule, an empty-pattern rule, or no robots.txt at all =>
  allowed (crawl-by-default, per the RFC).

Engine strategy: parsing runs in an Arrow-batched ``mapInPandas`` over
the (domain, robots_txt) dimension (pure-Python tokenizer, unit-tested
standalone); each rule compiles to an anchored regex in the Java ∩ RE2
common subset (escaped literals, ``.*``, optional ``$``), so BOTH
engines evaluate the exact same pattern text and the DuckDB oracle
replays verdicts bit-for-bit. Matching is a per-domain equi join —
rules per domain are few, URLs many; the rule side broadcasts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_META = r"\.^+?{}[]|()"


def robots_pattern_to_regex(pattern: str) -> str:
    """RFC 9309 path pattern -> anchored regex in the Java/RE2 common
    subset: literals escaped, ``*`` -> ``.*``, ONE trailing ``$`` kept
    as the end anchor (a ``$`` anywhere else is a literal)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch == "$":
            out.append(r"\$")
        elif ch in _META or ch == "\\":
            out.append("\\" + ch)
        else:
            out.append(ch)
    if anchored:
        out.append("$")
    return "".join(out)


def parse_robots_rules(
    text: str, agent: str = "*"
) -> list[tuple[bool, str]]:
    """robots.txt bytes -> the selected group's [(allow, pattern), ...]
    (empty patterns dropped — they mean "allow everything", which is the
    default verdict anyway). Comments (#) stripped; unknown directives
    (crawl-delay, sitemap) ignored; a ``user-agent`` line after rules
    starts a NEW group per the RFC grammar."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                groups.append((agents, rules))
                agents, rules, in_rules = [], [], False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if val:
                rules.append((key == "allow", val))
        # crawl-delay / sitemap / unknown: ignored
    if agents or rules:
        groups.append((agents, rules))
    tok = agent.lower()
    exact = [r for a, r in groups if tok in a]
    if exact:
        return [rule for rs in exact for rule in rs]
    star = [r for a, r in groups if "*" in a]
    return [rule for rs in star for rule in rs]


RULES_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("allow", T.BooleanType()),
        T.StructField("pattern", T.StringType()),
        T.StructField("pattern_len", T.IntegerType()),
        T.StructField("rx", T.StringType()),
    ]
)


def robots_rules(robots: DataFrame, agent: str = "*") -> DataFrame:
    """(domain, robots_txt) -> one row per selected rule:
    (domain, allow, pattern, pattern_len, rx)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for domain, txt in zip(pdf["domain"], pdf["robots_txt"]):
                try:
                    rules = parse_robots_rules(str(txt), agent)
                except Exception:  # noqa: BLE001 — poison degrades to none
                    rules = []
                for allow, pattern in rules:
                    rows.append(
                        (
                            domain,
                            allow,
                            pattern,
                            # RFC 9309 most-specific = longest in OCTETS,
                            # not characters: a multi-byte pattern must
                            # out-rank a same-char-count ASCII one
                            len(pattern.encode("utf-8")),
                            robots_pattern_to_regex(pattern),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["domain", "allow", "pattern", "pattern_len", "rx"]
            ).astype(
                {
                    "domain": "object", "allow": "bool", "pattern": "object",
                    "pattern_len": "int32", "rx": "object",
                }
            )

    return robots.mapInPandas(run, schema=RULES_SCHEMA)


def robots_verdicts(
    urls: DataFrame, robots: DataFrame, agent: str = "*"
) -> DataFrame:
    """Per URL: the RFC 9309 verdict against its domain's robots.txt.

    ``urls``: (url_id, domain, path); ``robots``: (domain, robots_txt).
    Returns (url_id, domain, path, allowed, rule_pattern) where
    rule_pattern is the winning rule (NULL = crawl-by-default).

    Scale shape: ONE scan of the URL side — non-matching rule rows are
    kept and FLAGGED (not filtered then restored with a second
    corpus-sized anti join, the r9 shape), so the crawl-by-default
    verdict falls out of the same url-keyed window that picks the
    winning rule. Rules are a per-domain dimension (broadcast); the URL
    side never shuffles except the url_id window over its few rule
    rows. Most-specific = longest pattern in OCTETS (RFC 9309), ties
    break to allow, then pattern text for determinism."""
    rules = robots_rules(robots, agent=agent)
    scored = urls.join(F.broadcast(rules), "domain", "left").select(
        "url_id",
        "domain",
        "path",
        "allow",
        "pattern",
        (F.col("rx").isNotNull() & F.expr("path RLIKE rx")).alias("is_match"),
        F.coalesce("pattern_len", F.lit(-1)).alias("plen"),
    )
    w = Window.partitionBy("url_id").orderBy(
        F.col("is_match").desc(),  # any matching rule beats no-match rows
        F.col("plen").desc(),
        F.col("allow").desc_nulls_last(),
        F.col("pattern"),  # same-length same-verdict tie: deterministic
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "url_id",
            "domain",
            "path",
            F.when(F.col("is_match"), F.col("allow"))
            .otherwise(F.lit(True))
            .alias("allowed"),
            F.when(F.col("is_match"), F.col("pattern")).alias("rule_pattern"),
        )
    )
