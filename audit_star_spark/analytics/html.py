"""HTML -> text extraction (north-star layer): the between-crawl-and-
quality-gate stage of a web-corpus pipeline — strip script/style blocks,
drop tags, decode the common entities, and canonicalize whitespace, plus
title/link metadata.

Pure JVM-side regexp algebra (zero shuffles, whole-stage codegen): no
HTML parser library, which is the right trade for corpus cleaning — the
published web-corpus recipes (C4, RefinedWeb) use exactly this class of
regex/heuristic extraction, not a DOM. Patterns stay inside the
Java-regex ∩ RE2 common subset ((?is) inline flags, non-greedy
quantifiers, no backrefs), so the DuckDB oracle mirrors them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) applied in order; mirrored 1:1 in the oracle SQL
HTML_STEPS: list[tuple[str, str]] = [
    (r"(?is)<head\b.*?</head>", " "),  # head first: metadata, not content
    (r"(?is)<script\b.*?</script>", " "),  # body-level executable blocks
    (r"(?is)<style\b.*?</style>", " "),
    (r"(?i)<(br|/p|/div|/h[1-6]|/li|/tr)\b[^>]*>", " \n"),  # block breaks
    (r"<[^>]*>", " "),  # every remaining tag
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),  # ampersand LAST: single-pass decode, no re-scan
    (r"\s+", " "),  # canonical whitespace
]


def html_text_expr(col: Column) -> Column:
    out = col
    for pat, rep in HTML_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def html_extract(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """Per document: ``text`` (extracted + whitespace-canonicalized),
    ``title`` (first <title> body, entity-decoded the same way), and
    ``n_links`` (count of <a href= openings). Everything is one
    projection over the raw row — embarrassingly parallel at any corpus
    size, and the extraction regexes are plan-locked into whole-stage
    codegen (no Python)."""
    raw_title = F.regexp_extract(F.col(html_col), r"(?is)<title[^>]*>(.*?)</title>", 1)
    return docs.select(
        *[c for c in docs.columns if c != html_col],
        html_text_expr(F.col(html_col)).alias("text"),
        html_text_expr(raw_title).alias("title"),
        # href must be followed by '=' so name='no-href' style attribute
        # VALUES containing the substring do not count as links
        F.size(
            F.expr(f"regexp_extract_all({html_col}, '(?is)<a\\\\s[^>]*href\\\\s*=', 0)")
        ).cast("long").alias("n_links"),
    )


# href value extraction: one pattern per quote style keeps each regex
# free of the OTHER quote char, so both embed cleanly in SQL literals
# on the oracle side
_HREF_DQ = r'(?is)<a\s[^>]*href\s*=\s*"([^"]*)"'
_HREF_SQ = r"(?is)<a\s[^>]*href\s*=\s*'([^']*)'"
_DOMAIN = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)"


def extract_links(pages: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """One row per href value: (id, url, domain) — domain is the
    lowercased authority for absolute URLs, '' for relative links.
    In-row extract + 1:N explode, no shuffle."""
    dq = F.regexp_extract_all(F.col(html_col), F.lit(_HREF_DQ), 1)
    sq = F.regexp_extract_all(F.col(html_col), F.lit(_HREF_SQ), 1)
    return pages.select(
        id_col, F.explode(F.concat(dq, sq)).alias("url")
    ).withColumn("domain", F.lower(F.regexp_extract("url", _DOMAIN, 1)))


def domain_stats(pages: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """Per-domain link statistics over a page corpus: (domain, n_links,
    n_docs) — the outlink census a crawl-frontier or per-domain
    quality-weighting pass starts from. One domain-keyed shuffle with
    map-side combine."""
    links = extract_links(pages, html_col, id_col)
    return links.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_links"),
        F.countDistinct(id_col).cast("long").alias("n_docs"),
    )


# URL canonicalization: the crawl-dedup primitive — two spellings of the
# same resource must map to one key before frontier dedup or per-URL
# aggregation. Steps (each mirrored in the DuckDB oracle):
#   1. strip the fragment (#...)
#   2. lowercase scheme and authority (path/query stay case-sensitive)
#   3. drop the default port (:80 for http, :443 for https)
#   4. empty path -> '/'
#   5. drop tracking query params (utm_*, fbclid, gclid); drop a then-
#      empty query entirely
# Relative URLs (no scheme) only get fragment-stripping.
_TRACKING = r"^(utm_[^=]*|fbclid|gclid)(=|$)"
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)"


def normalize_url(url: Column) -> Column:
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: (~kv.rlike(_TRACKING)) & (kv != ""),
    )
    fq = F.array_join(kept, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(fq != "", F.concat(F.lit("?"), fq)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(rebuilt)


def url_census(links: DataFrame, url_col: str = "url") -> DataFrame:
    """Collapse a link table onto canonical URLs: (url_norm, n_raw,
    n_spellings) — n_spellings > 1 is exactly the frontier-dedup win.
    One normalized-key shuffle with map-side combine."""
    return (
        links.withColumn("url_norm", normalize_url(F.col(url_col)))
        .groupBy("url_norm")
        .agg(
            F.count("*").cast("long").alias("n_raw"),
            F.countDistinct(url_col).cast("long").alias("n_spellings"),
        )
    )
