"""Sitemap ingestion: sitemap.xml / sitemap-index documents → crawl
seed URLs.

The engine's robots producer already surfaces ``Sitemap:`` directives
(operators/policy.py parse_robots_body keeps them as non-group
lines); this source closes the loop from those URLs' fetched XML to
a frontier seed table — the standard way a production crawl bootstraps
coverage beyond link reachability (sitemaps.org protocol: <urlset>
of <url> entries, or a <sitemapindex> of child <sitemap> entries).

Parsing is pure native Column expressions — regexp over the XML
text, entity decode via chained replace — NOT a Python XML parser:
* it fuses into the scan projection (zero exchanges for the parse
  itself at any corpus size, same argument as the C4/URL cleaners);
* sitemap XML is machine-generated and spec-constrained (the five
  standard entities are the ONLY escaping the protocol allows),
  so a full XML parser buys nothing but a per-row Python round trip;
* the regexes are (?s) non-greedy block scans, identical semantics
  in Java regex (Spark) and RE2 (DuckDB), which is what lets the
  driver gate hash-match the oracle.

Tolerance: entries missing <loc> parse to NULL loc and are dropped
by seeds_from_sitemaps; optional fields (<lastmod>, <changefreq>,
<priority>) surface as NULLs. Malformed trailing blocks simply do
not match the block regex — a truncated sitemap yields its complete
prefix, the WARC-reader convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK_RE = r"(?s)<(?:url|sitemap)>.*?</(?:url|sitemap)>"
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"<lastmod>\s*([^<]*?)\s*</lastmod>"
_CHANGEFREQ_RE = r"<changefreq>\s*([^<]*?)\s*</changefreq>"
_PRIORITY_RE = r"<priority>\s*([^<]*?)\s*</priority>"


def xml_unescape(col: Column) -> Column:
    """Decode the five XML standard entities (the only escaping the
    sitemap protocol permits). &amp; decodes LAST so '&amp;lt;' does
    not double-decode."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def sitemap_entries(
    df: DataFrame, xml_col: str = "xml", source_col: str = "sitemap_url"
) -> DataFrame:
    """Parse sitemap/sitemap-index documents.

    Input: one row per fetched sitemap (source_col = the sitemap's
    own URL, xml_col = its text). Output: one row per <url> or
    <sitemap> entry — (sitemap_url, kind['url'|'sitemap'], loc,
    lastmod, changefreq, priority), loc entity-decoded, optional
    fields NULL when absent. One narrow projection + explode: no
    exchange, no Python.
    """
    block = F.explode(
        F.regexp_extract_all(F.col(xml_col), F.lit(_BLOCK_RE), F.lit(0))
    ).alias("_block")
    exploded = df.select(F.col(source_col).alias("sitemap_url"), block)
    b = F.col("_block")

    def _opt(pattern: str) -> Column:
        return F.nullif(F.regexp_extract(b, pattern, 1), F.lit(""))

    return exploded.select(
        "sitemap_url",
        F.when(b.startswith("<url>"), F.lit("url"))
        .otherwise(F.lit("sitemap"))
        .alias("kind"),
        F.nullif(xml_unescape(F.regexp_extract(b, _LOC_RE, 1)), F.lit("")).alias(
            "loc"
        ),
        _opt(_LASTMOD_RE).alias("lastmod"),
        _opt(_CHANGEFREQ_RE).alias("changefreq"),
        _opt(_PRIORITY_RE).alias("priority"),
    )


def seeds_from_sitemaps(
    df: DataFrame, xml_col: str = "xml", source_col: str = "sitemap_url"
) -> DataFrame:
    """Distinct page URLs (kind='url', non-NULL loc) ready to union
    into the crawl's seed frame, plus the child sitemap URLs a
    fetch loop would recurse into (kind='sitemap'). One partial-
    aggregated distinct — the only exchange in the pipeline."""
    entries = sitemap_entries(df, xml_col=xml_col, source_col=source_col)
    return (
        entries.filter(F.col("loc").isNotNull())
        .select("kind", F.col("loc").alias("url"))
        .distinct()
    )


__all__ = ["sitemap_entries", "seeds_from_sitemaps", "xml_unescape"]
