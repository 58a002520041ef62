"""Deterministic synthetic Common-Crawl-style corpus generator.

Generates a ``web_pages(url, warc_ts, html, text, lang, status_code,
location, content_type)`` table distributedly (mapInPandas over
spark.range — no driver-side materialization), fully deterministic
from a seed via hash-mixing: no ``random``, no wall clock, so the
same (seed, n_pages, n_hosts) always yields byte-identical data on
any cluster size (FIXTURES.md §5 spec).

Shape:
* n_hosts hosts with Zipf-ish sizes (host 0 is the mega-host — the
  skew/salting test subject and the crawl start host)
* within a host, pages form a binary tree via links (local page i
  links to 2i+1, 2i+2) so everything is BFS-reachable from page 0
* pages sprinkle in every policy-relevant link flavor: cross-host
  probes, social skip-URLs, "." file paths, ?foo=bar querystrings,
  /external-site/ wrappers, files.consumerfinance.gov HEAD targets
* ~deterministic fractions of 404s, network errors, http->https and
  append-slash redirects, and non-HTML responses
* oracle columns text/lang are computed at generation time with the
  SAME extraction kernel the engine uses (independent end-to-end
  check is the simulated-reference crawler in tests/oracle_crawler.py)
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone
from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from website_indexer_spark.functions.extract import extract_page_fields

_VOCAB = (
    "loan credit mortgage consumer report complaint bureau finance rate "
    "payment debt card account bank rule data help money home auto school "
    "service protect market fair notice guide filing answer question"
).split()

_COMPONENTS = ["o-hero", "o-table", "m-notification", "m-pagination", "a-btn"]


def _h(seed: int, *parts: int) -> int:
    """Deterministic 64-bit hash mix of (seed, parts)."""
    data = seed.to_bytes(8, "little", signed=False) + b"".join(
        int(p).to_bytes(8, "little", signed=True) for p in parts
    )
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def host_boundaries(n_pages: int, n_hosts: int) -> List[int]:
    """Zipf-ish cumulative page-count boundaries per host: host h gets
    a share proportional to 1/(h+1)."""
    weights = np.array([1.0 / (h + 1) for h in range(n_hosts)])
    shares = weights / weights.sum()
    counts = np.maximum(1, np.floor(shares * n_pages).astype(int))
    # give any remainder to the mega-host
    counts[0] += n_pages - counts.sum()
    return np.concatenate([[0], np.cumsum(counts)]).tolist()


def _host_name(h: int) -> str:
    return f"host{h}.test"


def _page_url(h: int, i: int) -> str:
    return f"https://{_host_name(h)}/p{i}/"


def _words(seed: int, h: int, i: int, k: int, n: int) -> str:
    return " ".join(
        _VOCAB[_h(seed, h, i, k, j) % len(_VOCAB)] for j in range(n)
    )


def _page_html(
    seed: int, h: int, i: int, host_size: int, n_hosts: int, branching: int = 2
) -> str:
    hh = _h(seed, h, i, 1)
    lang = ["en", "es", None][hh % 3]
    lang_attr = f' lang="{lang}"' if lang else ""
    title = f"Page {h}/{i} | Consumer Financial Protection Bureau"

    comps = ""
    for c in range(hh % 3):
        cls = _COMPONENTS[_h(seed, h, i, 2, c) % len(_COMPONENTS)]
        comps += f'<div class="{cls}">{_words(seed, h, i, 3 + c, 6)}</div>'

    links: List[str] = []
    for child in range(branching * i + 1, branching * i + 1 + branching):
        if child < host_size:
            href = f"/p{child}/"
            if _h(seed, h, i, 4, child) % 37 == 0:
                # emitted as http:// — resolves via a 301 to https
                href = f"http://{_host_name(h)}/p{child}/"
            links.append(href)
    m = hh % 100
    if m < 20 and n_hosts > 1:
        h2 = 1 + _h(seed, h, i, 5) % (n_hosts - 1)
        links.append(_page_url(h2, _h(seed, h, i, 6) % 3))
    if m < 9:
        links.append("https://www.facebook.com/dialog/share?u=" + str(i))
    if m < 15:
        links.append(f"/doc{i}.pdf")
    if m < 12:
        links.append(f"/p{i}/?foo=bar")
    if m < 10:
        links.append(f"/p{i}/?page=2")
    if m < 8 and n_hosts > 1:
        h2 = 1 + _h(seed, h, i, 7) % (n_hosts - 1)
        target = _page_url(h2, 0).replace(":", "%3A").replace("/", "%2F")
        links.append(f"/external-site/?ext_url={target}")
    if m < 6:
        links.append(f"https://files.consumerfinance.gov/f/doc{i}.pdf")
    if m < 5:
        links.append(f"/gone{i}/")
    if m < 4:
        links.append(f"/dead{i}/")
    if m < 3:
        links.append(f"/img{i}/")
    if m < 2:
        links.append(f"/move{i}")  # 301 append-slash target

    anchors = "".join(
        f'<a href="{href}">{_words(seed, h, i, 8, 3)}</a> ' for href in links
    )
    paras = "".join(
        f"<p>{_words(seed, h, i, 9 + p, 12)}</p>" for p in range(2 + hh % 4)
    )
    return (
        f"<!DOCTYPE html><html{lang_attr}><head><title>{title}</title></head>"
        f"<body><h1>{title}</h1>{comps}{paras}{anchors}</body></html>"
    )


def generate_web_pages(
    spark: SparkSession,
    n_pages: int = 10_000,
    n_hosts: int = 20,
    seed: int = 42,
    partitions: int = 32,
    branching: int = 2,
) -> DataFrame:
    """Distributed deterministic generation: one input row per page id,
    1-5 output rows per page (the page + any special-URL rows its
    links reference). ``branching`` is each page's intra-host fanout:
    page i links to children branching*i+1 .. branching*i+branching,
    so BFS depth of a host of P pages is ~log_b(P) — small branching
    stresses the superstep loop, large branching stresses per-wave
    throughput."""
    bounds = host_boundaries(n_pages, n_hosts)
    base_ts = datetime(2025, 1, 1, tzinfo=timezone.utc).timestamp()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[Tuple] = []
            for pid in pdf["id"]:
                pid = int(pid)
                h = int(np.searchsorted(bounds, pid, side="right")) - 1
                i = pid - bounds[h]
                host_size = bounds[h + 1] - bounds[h]
                url = _page_url(h, i)
                html = _page_html(seed, h, i, host_size, n_hosts, branching)
                page = extract_page_fields(html, _host_name(h))
                ts = datetime.fromtimestamp(
                    base_ts + (_h(seed, h, i, 0) % 86_400_000) / 1000.0,
                    tz=timezone.utc,
                )
                rows.append(
                    (
                        url,
                        ts,
                        html.encode("utf-8"),
                        page.text if page else None,
                        page.language if page else None,
                        200,
                        None,
                        "text/html",
                    )
                )
                # special rows referenced by this page's links
                hh = _h(seed, h, i, 1)
                m = hh % 100
                for child in range(branching * i + 1, branching * i + 1 + branching):
                    if child < host_size and _h(seed, h, i, 4, child) % 37 == 0:
                        rows.append(
                            (
                                f"http://{_host_name(h)}/p{child}/",
                                ts,
                                None,
                                None,
                                None,
                                301,
                                _page_url(h, child),
                                "text/html",
                            )
                        )
                if m < 10:
                    # the ?page=2 variant serves the same content
                    rows.append(
                        (f"{url}?page=2", ts, html.encode("utf-8"),
                         page.text if page else None,
                         page.language if page else None,
                         200, None, "text/html")
                    )
                if m < 5:
                    rows.append(
                        (f"https://{_host_name(h)}/gone{i}/", ts, None, None,
                         None, 404, None, "text/html")
                    )
                if m < 4:
                    rows.append(
                        (f"https://{_host_name(h)}/dead{i}/", ts, None, None,
                         None, 200, None, "text/html")
                    )
                if m < 3:
                    rows.append(
                        (f"https://{_host_name(h)}/img{i}/", ts, b"\x89PNG",
                         None, None, 200, None, "image/png")
                    )
                if m < 2:
                    rows.append(
                        (f"https://{_host_name(h)}/move{i}", ts, None, None,
                         None, 301, f"https://{_host_name(h)}/move{i}/",
                         "text/html")
                    )
                    rows.append(
                        (f"https://{_host_name(h)}/move{i}/", ts,
                         b"<html><head><title>Moved</title></head>"
                         b"<body>landed</body></html>",
                         "landed", None, 200, None, "text/html")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "warc_ts", "html", "text", "lang",
                    "status_code", "location", "content_type",
                ],
            )

    from website_indexer_spark.sources.tables import WEB_PAGES_SCHEMA

    return (
        spark.range(0, n_pages, numPartitions=partitions)
        .mapInPandas(gen, WEB_PAGES_SCHEMA)
        .dropDuplicates(["url"])
    )


# --------------------------------------------------------------------
# Deterministic derivations from the driver's `documents` testdata —
# web-SHAPED columns (multi-line punctuated text, URLs, a pages table)
# for gating the web-cleaning / URL-quality / CDX operators. Every
# expression here is pure native Column arithmetic with an exact
# DuckDB twin (plans/catalog.py::WEBTEXT_CTE / DOC_URLS_CTE /
# DOC_PAGES_CTE), so the oracle gates hash the SAME derived bytes on
# both engines. No randomness, no wall clock.
# --------------------------------------------------------------------

WEBTEXT_WRAP = 8  # tokens per derived line


def weblines_from_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, source, lang, text) where text is a deterministic
    multi-line web-shaped rewrite of the document: every 8 tokens
    become a line; per (doc_id + line_index) % 12 a line is left
    unpunctuated (m=0), tagged with ' javascript required.' (m=1),
    truncated to one word (m=2), or suffixed with a cookie-notice
    phrase (m=3) — the C4 line-filter drop flavors — otherwise it
    gets a terminal '.'. Docs with doc_id % 41 == 0 append a
    'lorem ipsum' line and % 43 == 0 a curly-brace code line (the
    C4 page-level drop flavors). Line vocabulary repeats heavily
    across docs, which is exactly what the paragraph-dedup gate
    wants. Tokenized ONCE in an owned projection (Catalyst does not
    CSE across higher-order lambdas — SURVEY §10.22)."""
    from pyspark.sql import functions as F

    from website_indexer_spark.functions.textstats import tokens

    W = WEBTEXT_WRAP
    toked = docs.select(
        "doc_id", "source", "lang", tokens(F.col("text")).alias("_t")
    )
    t, doc = F.col("_t"), F.col("doc_id")
    n = F.size(t)

    def line(i):
        raw = F.array_join(F.slice(t, i * W + 1, W), " ")
        m = (doc + i) % 12
        return (
            F.when(m == 0, raw)
            .when(m == 1, F.concat(raw, F.lit(" javascript required.")))
            .when(m == 2, F.concat(F.element_at(t, i * W + 1), F.lit(".")))
            .when(m == 3, F.concat(raw, F.lit(" please review our privacy policy.")))
            .otherwise(F.concat(raw, F.lit(".")))
        )

    body = F.when(
        n > 0,
        F.transform(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.ceil(n.cast("double") / F.lit(W)).cast("int") - 1,
                    F.lit(0),
                ),
            ),
            line,
        ),
    ).otherwise(F.array().cast("array<string>"))
    extra = (
        F.when(doc % 41 == 0, F.array(F.lit("lorem ipsum dolor sit amet.")))
        .when(doc % 43 == 0, F.array(F.lit("if (x) { return; }")))
        .otherwise(F.array().cast("array<string>"))
    )
    return toked.select(
        "doc_id",
        "source",
        "lang",
        F.array_join(F.concat(body, extra), "\n").alias("text"),
    )


def urls_from_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, source, url) with deterministic URL shapes exercising
    every url_quality feature: scheme mix, numbered subdomain hosts,
    uppercase-host variants (%5), an :8080 port (%11), a /casino
    blocklist segment (%17), deep paths, and three query flavors
    (sortable id+ref pair / single utm param / none)."""
    from pyspark.sql import functions as F

    doc = F.col("doc_id")
    hostbase = F.concat(
        F.col("source"), F.lit("-"), (doc % 7).cast("string"),
        F.lit(".example.com"),
    )
    host = F.when(doc % 5 == 0, F.upper(hostbase)).otherwise(hostbase)
    url = F.concat(
        F.when(doc % 2 == 0, F.lit("https")).otherwise(F.lit("http")),
        F.lit("://"),
        host,
        F.when(doc % 11 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.when(doc % 17 == 0, F.lit("/casino")).otherwise(F.lit("")),
        F.lit("/sec"), (doc % 13).cast("string"),
        F.lit("/page"), doc.cast("string"),
        F.when(doc % 3 == 0,
               F.concat(F.lit("?ref=rss&id="), doc.cast("string")))
        .when(doc % 3 == 1, F.lit("?utm_source=feed"))
        .otherwise(F.lit("")),
    )
    return docs.select("doc_id", "source", url.alias("url"))


DOC_PAGES_EPOCH = 1735689600  # 2025-01-01T00:00:00Z


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """web_pages-shaped rows derived from documents: the urls above,
    warc_ts = epoch + 37s * doc_id, html = utf-8 bytes of the text,
    status 200 (301 with a location for doc_id % 19 == 0). Input for
    the CDX-index gate."""
    from pyspark.sql import functions as F

    doc = F.col("doc_id")
    return (
        urls_from_documents(docs)
        .join(docs.select("doc_id", "text", "lang"), "doc_id")
        .select(
            "doc_id",
            "url",
            F.timestamp_seconds(F.lit(DOC_PAGES_EPOCH) + doc * 37).alias(
                "warc_ts"
            ),
            F.encode(F.col("text"), "UTF-8").alias("html"),
            "text",
            "lang",
            F.when(doc % 19 == 0, F.lit(301))
            .otherwise(F.lit(200))
            .alias("status_code"),
            F.when(doc % 19 == 0, F.concat(F.col("url"), F.lit("/moved")))
            .otherwise(F.lit(None).cast("string"))
            .alias("location"),
            F.lit("text/html").alias("content_type"),
        )
    )


def links_from_documents(docs: DataFrame, n_docs: int) -> DataFrame:
    """(src, dst) doc-level link edges, deterministic from doc_id:
    doc i emits 1 + i % 3 out-links, target_j = (i * 2654435761 +
    j * 40503) % n_docs (Knuth multiplicative mix — targets spread
    uniformly, every value exact in bigint), self-loops dropped.
    Multiplicity kept: colliding targets are parallel edges, which
    PageRank treats as repeated links (both engines identically).
    ``n_docs`` is passed explicitly (doc_id is dense 0..n-1 in the
    testdata tables; the DuckDB mirror computes count(*) itself)."""
    from pyspark.sql import functions as F

    d = F.col("doc_id")
    e = docs.select(
        d.alias("src"),
        F.explode(
            F.sequence(F.lit(1), (F.lit(1) + d % 3).cast("int"))
        ).alias("j"),
    ).select(
        "src",
        (
            (F.col("src") * F.lit(2654435761) + F.col("j") * F.lit(40503))
            % F.lit(n_docs)
        ).alias("dst"),
    )
    return e.filter(F.col("dst") != F.col("src"))


def sitemaps_from_documents(docs: DataFrame) -> DataFrame:
    """(sitemap_url, xml) — one sitemaps.org <urlset> document per
    source (entries = that source's urls_from_documents rows, sorted
    by doc_id, XML-entity-escaped; lastmod on even doc_ids, priority
    on doc_id % 3 == 0, changefreq on doc_id % 5 == 0) plus ONE
    <sitemapindex> document listing every per-source sitemap. The
    query-string URLs contain '&', so the escape → parse → unescape
    round trip is exercised by construction."""
    from pyspark.sql import functions as F

    u = urls_from_documents(docs)
    doc = F.col("doc_id")

    def esc(col):
        out = col
        for ch, ent in (
            ("&", "&amp;"),
            ("<", "&lt;"),
            (">", "&gt;"),
            ('"', "&quot;"),
            ("'", "&apos;"),
        ):
            out = F.replace(out, F.lit(ch), F.lit(ent))
        return out

    lastmod = F.when(
        doc % 2 == 0,
        F.concat(
            F.lit("<lastmod>"),
            F.date_format(
                F.timestamp_seconds(F.lit(DOC_PAGES_EPOCH) + doc * 37),
                "yyyy-MM-dd",
            ),
            F.lit("</lastmod>"),
        ),
    ).otherwise(F.lit(""))
    changefreq = F.when(
        doc % 5 == 0,
        F.concat(
            F.lit("<changefreq>"),
            F.element_at(
                F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly")),
                (doc % 3).cast("int") + 1,
            ),
            F.lit("</changefreq>"),
        ),
    ).otherwise(F.lit(""))
    priority = F.when(
        doc % 3 == 0,
        F.concat(
            F.lit("<priority>0."),
            (doc % 10).cast("string"),
            F.lit("</priority>"),
        ),
    ).otherwise(F.lit(""))
    frag = F.concat(
        F.lit("<url><loc>"), esc(F.col("url")), F.lit("</loc>"),
        lastmod, changefreq, priority, F.lit("</url>"),
    )
    per_source = (
        u.select("source", F.struct(doc.alias("d"), frag.alias("f")).alias("e"))
        .groupBy("source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda s: s["f"]
                ),
                "",
            ).alias("body")
        )
        .select(
            F.concat(
                F.lit("https://"), F.col("source"),
                F.lit(".example.com/sitemap.xml"),
            ).alias("sitemap_url"),
            F.concat(
                F.lit('<?xml version="1.0" encoding="UTF-8"?>\n'
                      '<urlset xmlns="http://www.sitemaps.org/schemas/'
                      'sitemap/0.9">'),
                F.col("body"),
                F.lit("</urlset>"),
            ).alias("xml"),
        )
    )
    index = (
        docs.select("source")
        .distinct()
        .select(
            F.concat(
                F.lit("<sitemap><loc>https://"), F.col("source"),
                F.lit(".example.com/sitemap.xml</loc></sitemap>"),
            ).alias("frag"),
            F.col("source"),
        )
        .groupBy()
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("source", "frag"))
                    ),
                    lambda s: s["frag"],
                ),
                "",
            ).alias("body")
        )
        .select(
            F.lit("https://index.example.com/sitemap_index.xml").alias(
                "sitemap_url"
            ),
            F.concat(
                F.lit('<?xml version="1.0" encoding="UTF-8"?>\n'
                      "<sitemapindex>"),
                F.col("body"),
                F.lit("</sitemapindex>"),
            ).alias("xml"),
        )
    )
    return per_source.unionAll(index)


def robots_from_documents(docs: DataFrame) -> DataFrame:
    """(host, body) — one deterministic robots.txt body per derived
    host (the lowercase ``source-h.example.com`` hosts of
    urls_from_documents, h = doc_id % 7). The seven h-cases cover the
    Crawl-delay grammar end-to-end: no delay line (0), fractional
    delay + mixed-case key + comment (1), Sitemap line inside the
    group (2), multi-group max-wins with a non-applying agent (3),
    unparseable value (4), zero delay (5), and a delay so large the
    min_budget floor binds (6). The DuckDB oracle mirrors only the
    (host, expected-delay) arithmetic — the Spark side must actually
    parse these bodies (policy.parse_crawl_delay), so the gate pins
    parser + budget arithmetic together."""
    from pyspark.sql import functions as F

    hosts = (
        docs.select(
            F.concat(
                F.col("source"), F.lit("-"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".example.com"),
            ).alias("host"),
            (F.col("doc_id") % 7).cast("int").alias("hmod"),
        )
        .distinct()
    )
    h = F.col("hmod")
    host = F.col("host")
    body = (
        F.when(h == 0, F.lit("User-agent: *\nDisallow: /tmp\n"))
        .when(h == 1, F.concat(
            F.lit("# robots for "), host,
            F.lit("\nUser-agent: *\nCrawl-Delay: 0.5\nDisallow: /x\n"),
        ))
        .when(h == 2, F.concat(
            F.lit("User-agent: *\nSitemap: https://"), host,
            F.lit("/sitemap.xml\nCrawl-delay: 2\n"),
        ))
        .when(h == 3, F.lit(
            "User-agent: *\nCrawl-delay: 4\n\n"
            "User-agent: specialbot\nCrawl-delay: 20\n\n"
            "User-agent: *\nCrawl-delay: 10\n"
        ))
        .when(h == 4, F.lit("User-agent: *\nCrawl-delay: soon\n"))
        .when(h == 5, F.lit("User-agent: *\nCrawl-delay: 0\n"))
        .otherwise(F.lit("User-agent: *\nCrawl-delay: 9999\n"))
    )
    return hosts.select("host", body.alias("body"))


def captures_from_documents(docs: DataFrame) -> DataFrame:
    """web_pages-shaped 4-snapshot capture history per derived URL
    (the CDX-family gate corpus): even doc_ids change content at
    snapshot 2 only (digest runs [0,1][2,3] — the collapse case),
    odd doc_ids change every snapshot. Timestamps are epoch +
    doc_id*37 + snap*1e6 so per-URL staleness varies
    deterministically."""
    from pyspark.sql import functions as F

    u = urls_from_documents(docs).join(
        docs.select("doc_id", "text"), "doc_id"
    )
    caps = u.select(
        "doc_id",
        "url",
        "text",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("snap"),
    )
    doc, sn = F.col("doc_id"), F.col("snap")
    ver = F.when(doc % 2 == 0, F.floor(sn / 2)).otherwise(sn).cast("int")
    return caps.select(
        "url",
        F.timestamp_seconds(
            F.lit(DOC_PAGES_EPOCH) + doc * 37 + sn * 1_000_000
        ).alias("warc_ts"),
        F.encode(
            F.concat(F.col("text"), F.lit("#"), ver.cast("string")),
            "UTF-8",
        ).alias("html"),
        F.lit(200).alias("status_code"),
        F.lit("text/html").alias("content_type"),
    )


def damaged_from_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, source, text) with deterministic decode damage
    injected for the encoding-quality gates: doc_id % 5 == 0 gains a
    mojibake suffix (UTF-8 'café' and a curly quote read as
    Windows-1252), doc_id % 7 == 0 gains a U+FFFD replacement char
    plus C0/C1 control bytes; % 35 rows carry both, everything else
    passes through clean. The DuckDB twin builds byte-identical
    strings from chr() codepoints (catalog.py::_ENC_CTE)."""
    from pyspark.sql import functions as F

    doc = F.col("doc_id")
    # ' caf' + 'Ã©' (c3 a9 read as cp1252) + ' ' + 'â€™' (e2 80 99
    # read as cp1252) + 's'
    moji = F.when(
        doc % 5 == 0,
        F.lit(" cafÃ© â€™s"),
    ).otherwise(F.lit(""))
    # U+FFFD + C0 control + C1 control
    ctrl = F.when(
        doc % 7 == 0, F.lit("\ufffd\u0001\u009f")
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        "source",
        F.concat(F.col("text"), moji, ctrl).alias("text"),
    )
