"""Sitemap source (sources/sitemap.py): entity decoding, optional
fields, index documents, malformed tails, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from website_indexer_spark.sources.sitemap import (
    seeds_from_sitemaps,
    sitemap_entries,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>https://a.test/?x=1&amp;y=2</loc><lastmod>2024-01-05</lastmod>
<changefreq>weekly</changefreq><priority>0.8</priority></url>
<url><loc>
  https://a.test/plain
</loc></url>
<url><lastmod>2024-02-02</lastmod></url>
<url><loc>https://a.test/&lt;odd&gt;&apos;q&apos;&quot;z&quot;</loc></url>
</urlset>"""

INDEX = """<?xml version="1.0"?><sitemapindex>
<sitemap><loc>https://a.test/sitemap-1.xml</loc>
<lastmod>2024-03-01</lastmod></sitemap>
<sitemap><loc>https://a.test/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""

TRUNCATED = "<urlset><url><loc>https://t.test/ok</loc></url><url><loc>https://t.te"


@pytest.fixture(scope="module")
def sm(spark):
    rows = [
        ("https://a.test/sitemap.xml", URLSET),
        ("https://a.test/sitemap_index.xml", INDEX),
        ("https://t.test/sitemap.xml", TRUNCATED),
    ]
    return spark.createDataFrame(rows, ["sitemap_url", "xml"])


def test_urlset_entries(spark, sm):
    rows = {
        r["loc"]: r
        for r in sitemap_entries(sm)
        .filter(F.col("sitemap_url") == "https://a.test/sitemap.xml")
        .collect()
    }
    amp = rows["https://a.test/?x=1&y=2"]
    assert amp["kind"] == "url"
    assert amp["lastmod"] == "2024-01-05"
    assert amp["changefreq"] == "weekly"
    assert amp["priority"] == "0.8"
    plain = rows["https://a.test/plain"]  # whitespace-stripped loc
    assert plain["lastmod"] is None
    assert "https://a.test/<odd>'q'\"z\"" in rows  # all five entities
    assert None in rows  # loc-less entry parses to NULL loc
    assert len(rows) == 4


def test_index_entries(spark, sm):
    rows = (
        sitemap_entries(sm)
        .filter(F.col("kind") == "sitemap")
        .orderBy("loc")
        .collect()
    )
    assert [r["loc"] for r in rows] == [
        "https://a.test/sitemap-1.xml",
        "https://a.test/sitemap-2.xml",
    ]
    assert rows[0]["lastmod"] == "2024-03-01"


def test_truncated_tail_yields_complete_prefix(spark, sm):
    rows = (
        sitemap_entries(sm)
        .filter(F.col("sitemap_url") == "https://t.test/sitemap.xml")
        .collect()
    )
    assert [r["loc"] for r in rows] == ["https://t.test/ok"]


def test_seeds_drop_null_locs_and_dedupe(spark):
    xml = (
        "<urlset><url><loc>https://d.test/p</loc></url>"
        "<url><loc>https://d.test/p</loc></url>"
        "<url></url></urlset>"
    )
    df = spark.createDataFrame(
        [("s1", xml), ("s2", xml)], ["sitemap_url", "xml"]
    )
    rows = seeds_from_sitemaps(df).collect()
    assert [(r["kind"], r["url"]) for r in rows] == [
        ("url", "https://d.test/p")
    ]


def test_entries_plan_is_narrow(spark, sm):
    p = sitemap_entries(sm)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "Python" not in p


# ---------------------------------------------------------------- robots
# Sitemap: discovery (operators/policy.py::robots_sitemaps) — the
# producer that feeds this source's fetch loop.

ROBOTS_MULTI = (
    "# preamble comment\r\n"
    "User-agent: *\r\n"
    "Disallow: /tmp\r\n"
    "SITEMAP: https://r.test/sitemap-A.xml\r\n"
    "\r\n"
    "User-agent: special\r\n"
    "  sitemap:\thttps://r.test/sitemap-B.xml # trailing comment\r\n"
    "Sitemap: https://r.test/sitemap-A.xml\r\n"
)
ROBOTS_NONE = "User-agent: *\nDisallow: /private\n"
ROBOTS_TRAP = (
    "Disallow: Sitemap: https://bad.test/not-a-directive.xml\n"
    "Sitemap:\n"
)


def test_robots_sitemaps_grammar(spark):
    from website_indexer_spark.operators.policy import robots_sitemaps

    bodies = spark.createDataFrame(
        [
            ("r.test", ROBOTS_MULTI),
            ("none.test", ROBOTS_NONE),
            ("trap.test", ROBOTS_TRAP),
        ],
        "host string, body string",
    )
    got = {
        (r.host, r.sitemap_url)
        for r in robots_sitemaps(bodies).collect()
    }
    # case-insensitive key, leading whitespace, tab separator, CRLF,
    # trailing comment stripped, duplicate collapsed by the distinct;
    # mid-line 'Sitemap:' inside a Disallow value and a value-less
    # directive both produce nothing
    assert got == {
        ("r.test", "https://r.test/sitemap-A.xml"),
        ("r.test", "https://r.test/sitemap-B.xml"),
    }


def test_robots_sitemaps_is_native(spark):
    from website_indexer_spark.operators.policy import robots_sitemaps

    bodies = spark.createDataFrame(
        [("h.test", ROBOTS_MULTI)], "host string, body string"
    )
    plan = robots_sitemaps(bodies)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python anywhere in the plan


def test_robots_sitemaps_feeds_seed_loop(spark):
    """Discovery -> fetched XML -> seeds: the composed bootstrap."""
    from website_indexer_spark.operators.policy import robots_sitemaps

    bodies = spark.createDataFrame(
        [("a.test", "Sitemap: https://a.test/sitemap.xml\n")],
        "host string, body string",
    )
    discovered = robots_sitemaps(bodies)
    fetched = discovered.join(
        spark.createDataFrame(
            [("https://a.test/sitemap.xml", URLSET)],
            "sitemap_url string, xml string",
        ),
        "sitemap_url",
    )
    seeds = seeds_from_sitemaps(
        fetched, xml_col="xml", source_col="sitemap_url"
    )
    urls = {r.url for r in seeds.filter(F.col("kind") == "url").collect()}
    assert "https://a.test/plain" in urls and len(urls) == 3
