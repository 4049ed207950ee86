"""HTML -> text extraction: head/script/style stripping, entity decoding,
link counting, and whitespace canonicalization."""

from audit_star_spark.analytics.html import html_extract


def _pages(spark, htmls):
    return spark.createDataFrame(
        [(i, h) for i, h in enumerate(htmls)], "doc_id long, html string"
    )


def test_html_extract_semantics(spark):
    page = (
        "<html><head><title> Hello &amp; <b>World</b> </title>"
        "<style>body{}</style></head><body>"
        "<SCRIPT>\nif (a < b) { alert('x'); }\n</SCRIPT>"
        "<h1>Header</h1><p>one&nbsp;two   three</p>"
        "<a href='/x'>l1</a><A HREF='http://y'>l2</A><a name='no-href'>n</a>"
        "&lt;tag&gt; &#39;q&#39; &quot;d&quot; a &amp; b</body></html>"
    )
    [r] = html_extract(_pages(spark, [page])).collect()
    # script/style/head gone, tags stripped, entities decoded, spaces collapsed
    assert r["text"] == "Header one two three l1 l2 n <tag> 'q' \"d\" a & b"
    # title comes from the raw html (before head-stripping), tags dropped
    assert r["title"] == "Hello & World"
    # case-insensitive href counting; <a> without href not counted
    assert r["n_links"] == 2


def test_html_extract_plain_text_passthrough(spark):
    [r] = html_extract(_pages(spark, ["  just   words, no markup  "])).collect()
    assert r["text"] == "just words, no markup"
    assert r["title"] == ""
    assert r["n_links"] == 0


def test_extract_links_and_domain_stats(spark):
    from audit_star_spark.analytics.html import domain_stats, extract_links

    pages = _pages(
        spark,
        [
            '<a href="https://A.Example.com/x">1</a>'
            "<a href='http://a.example.com:8080/y?q=1#f'>2</a>"
            '<a href="/relative">3</a>',
            '<a href="https://other.org">4</a><a name="x">no link</a>',
        ],
    )
    links = {(r["doc_id"], r["url"]): r["domain"] for r in extract_links(pages).collect()}
    assert links[(0, "https://A.Example.com/x")] == "a.example.com"
    # authority keeps the port; query/fragment never leak into the domain
    assert links[(0, "http://a.example.com:8080/y?q=1#f")] == "a.example.com:8080"
    assert links[(0, "/relative")] == ""
    assert len(links) == 4
    stats = {r["domain"]: (r["n_links"], r["n_docs"]) for r in domain_stats(pages).collect()}
    assert stats[""] == (1, 1)
    assert stats["other.org"] == (1, 1)
