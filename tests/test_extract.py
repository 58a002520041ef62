"""Extraction-kernel goldens, ported from the reference test suite.

Sources of truth:
* /root/reference/crawler/tests/test_models.py:55-139 (unit goldens)
* /root/reference/crawler/fixtures/sample.json (sample-site crawl goldens)
* /root/reference/sample/src/*.html (the fixture site's source pages)

No Spark in this file — the kernel is pure Python by design.
"""

import pathlib

from website_indexer_spark.functions.extract import extract_page_fields

SAMPLE_SRC = pathlib.Path("/root/reference/sample/src")

TEST_PAGE_HTML = """
<html lang="en">
<head><title>Test page</title></head>
<body>
    <script>Ignore me!</script>
    <div class="m-links">Links</div>
        <div><a href="/page/">A regular link on the same domain.</a></div>
        <div class="a-external-link">
            <a href="/external-site/?ext_url=https%3A%2F%2Fexample.org%2F">
                An external link pointing to another domain
            </a>
            <a href="/external-site/">
                An external link missing its target
            </a>
            <a href="https://example.org/external-site/">
                A link on another domain that also uses /external-site/
            </a>
            <a href="//[invalid]">
                A deliberately invalid link
            </a>
        </div>
</body>
</html>
""".strip()


def test_no_title_returns_none():
    # test_models.py:56-63
    assert (
        extract_page_fields(
            "<html><head></head><body>This page has no title.</body></html>",
            "example.com",
        )
        is None
    )


def test_from_html_golden():
    # test_models.py:65-120
    page = extract_page_fields(TEST_PAGE_HTML, "example.com")
    assert page is not None
    assert page.title == "Test page"
    assert page.language == "en"
    assert page.text == (
        "Links "
        "A regular link on the same domain. "
        "An external link pointing to another domain "
        "An external link missing its target "
        "A link on another domain that also uses /external-site/ "
        "A deliberately invalid link"
    )
    assert sorted(page.components) == ["a-external-link", "m-links"]
    assert sorted(page.links) == sorted(
        [
            "/external-site/",
            "/page/",
            "https://example.org/",
            "https://example.org/external-site/",
            "//[invalid]",
        ]
    )
    # kernel returns links/components already sorted (parser.py:115,120)
    assert page.links == sorted(page.links)
    assert page.components == sorted(page.components)


def test_no_body():
    # test_models.py:132-139 — note the fixture html has an unclosed
    # <title> and no </head>; lenient recovery must still find the title.
    html = '<html lang="en"><head><title>Test page with no body</head></html>'
    page = extract_page_fields(html, "example.com")
    assert page is not None
    assert page.title == "Test page with no body"
    assert page.language == "en"
    assert page.text is None
    assert page.links == []
    assert page.components == []


def test_sample_homepage_golden():
    # fixture golden from crawler/fixtures/sample.json (FIXTURES.md §3)
    html = (SAMPLE_SRC / "index.html").read_text()
    page = extract_page_fields(html, "localhost:8000")
    assert page is not None
    assert page.title == "Sample homepage"
    assert page.language == "en"
    assert page.text == (
        "Sample homepage This is sample content. This is a sample component. "
        "This is a link to a child page. This is a link somewhere else. "
        "This is an obfuscated link somewhere else. This is another "
        "obfuscated link some where else. This links to a file. This links "
        "to a file somewhere else. This link has a page query string "
        "parameter. This link has a non-page query string parameter. This "
        "link has multiple query string parameters."
    )
    assert page.components == ["o-sample"]
    assert page.links == sorted(
        [
            "./file.xlsx",
            "/child/",
            "/child/?foo=bar",
            "/child/?page=2",
            "/child/?page=2&foo=bar",
            "https://example.com/",
            "https://example.com/file.xlsx",
            "https://example.org/",
        ]
    )


def test_sample_child_golden():
    html = (SAMPLE_SRC / "child" / "index.html").read_text()
    page = extract_page_fields(html, "localhost:8000")
    assert page is not None
    assert page.title == "Sample child page"
    assert page.language == "en"
    assert page.text == (
        "Sample child page This is sample content. This is a link to the homepage."
    )
    assert page.components == []
    assert page.links == ["/"]


def test_entity_and_nbsp_collapse():
    html = (
        '<html lang="en"><head><title> Spaced title </title></head>'
        "<body><p>a&nbsp;&amp;&nbsp;b   \n\t c</p></body></html>"
    )
    page = extract_page_fields(html, "example.com")
    assert page.title == "Spaced title"  # .strip() per parser.py:72
    # &nbsp; decodes to \xa0 which re \s+ collapses like lxml's path
    assert page.text == "a & b c"


def test_drop_header_footer_skipnav_keeps_tails():
    html = (
        "<html><head><title>T</title></head><body>"
        '<div class="o-header x">H</div>tail1'
        '<div class="skip-nav">S</div>tail2'
        "<p>mid<img src=\"x.png\">after</p>"
        '<div class="o-footer">F</div>tail3'
        "<style>.x{}</style>styled"
        "</body></html>"
    )
    page = extract_page_fields(html, "example.com")
    # dropped subtrees vanish; their tail text survives and is joined
    # directly (no separator), exactly like lxml drop_tree + text_content
    assert page.text == "tail1tail2midaftertail3styled"


def test_component_regex_matches_text_too():
    # The reference regex matches o-/m-/a- tokens anywhere whitespace-
    # preceded in the serialized body, including inside text, by design.
    html = (
        "<html><head><title>T</title></head><body>"
        '<div class="o-real second-token m-both">x</div>'
        "<p>mention of a-textual token</p>"
        "</body></html>"
    )
    page = extract_page_fields(html, "example.com")
    assert page.components == ["a-textual", "m-both", "o-real"]


def test_external_site_unwrap_rules():
    html = (
        "<html><head><title>T</title></head><body>"
        '<a href="/external-site/?ext_url=https%3A%2F%2Fa.example%2Fp">wrapped</a>'
        '<a href="http://internal.test/external-site/?ext_url=https%3A%2F%2Fb.example%2F">host-match</a>'
        '<a href="http://other.test/external-site/?ext_url=https%3A%2F%2Fc.example%2F">host-mismatch</a>'
        '<a href="/external-site/">no-target</a>'
        "</body></html>"
    )
    page = extract_page_fields(html, "internal.test")
    assert page.links == sorted(
        [
            "https://a.example/p",
            "https://b.example/",
            "http://other.test/external-site/?ext_url=https%3A%2F%2Fc.example%2F",
            "/external-site/",
        ]
    )


def test_dedup_links():
    html = (
        "<html><head><title>T</title></head><body>"
        '<a href="/x/">one</a><a href="/x/">two</a><a href="/y/">three</a>'
        "</body></html>"
    )
    page = extract_page_fields(html, "example.com")
    assert page.links == ["/x/", "/y/"]


# --------------------------------------------------------------------
# Parse-time budget (reference parser.py:46-58's 5 s kill)
# --------------------------------------------------------------------

def test_parse_budget_drops_pathological_page():
    from website_indexer_spark.functions.extract import (
        ParseTimeout,
        extract_page_fields,
    )

    # large enough to span many feed chunks so the cooperative
    # deadline check fires deterministically
    big = (
        "<html><head><title>t</title></head><body>"
        + "<p>word</p>" * 200_000
        + "</body></html>"
    )
    import pytest as _pytest

    with _pytest.raises(ParseTimeout):
        extract_page_fields(big, "h", time_budget_s=0.0)
    # same page parses fine with the budget armed but not hit (an
    # explicit generous bound, not PARSE_BUDGET_S: this page takes
    # ~2 s alone but has crossed 5 s under full-suite CPU contention,
    # so asserting the default budget here is machine-speed flaky)…
    assert extract_page_fields(big, "h", time_budget_s=60.0).title == "t"
    # …and the guard can be disabled outright
    assert extract_page_fields(big, "h", time_budget_s=None).title == "t"


def test_parse_budget_udf_batch_survives(spark):
    """A batch containing a genuinely >5 s page completes: the
    pathological page is dropped (NULL struct, like a no-title page)
    while its batch-mates extract normally."""
    from pyspark.sql import functions as F

    from website_indexer_spark.functions.udfs import extract_udf

    ok = "<html><head><title>ok</title></head><body>hi</body></html>"
    # ~8 MB of dense elements parses in >10 s unbudgeted (measured);
    # the 5 s budget kills it deterministically
    slow = (
        "<html><head><title>slow</title></head><body>"
        + "<p a b c d e f>w</p>" * 400_000
        + "</body></html>"
    )
    df = spark.createDataFrame(
        [(1, ok.encode()), (2, slow.encode())], "id long, html binary"
    )
    rows = {
        r["id"]: r["e"]
        for r in df.select(
            "id", extract_udf(F.col("html"), F.lit("h")).alias("e")
        ).collect()
    }
    assert rows[1]["title"] == "ok"
    assert rows[2]["title"] is None  # timed out => dropped
