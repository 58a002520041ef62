"""Arrow-batched pandas UDFs — the only Python that runs on executors.

Per the build contract ("vectorized pandas/Arrow UDFs, no per-row
Python" at the Spark level), exactly two UDFs exist in the crawl hot
path:

* ``extract_udf`` — the §2.B extraction kernel over ``html:binary``
  (reference: crawler/parser.py via crawler/models.py:116-140)
* ``canonicalize_links_udf`` — per-page frontier-link resolution
  (urljoin + unwrap; reference: wpull URL resolution + plugin.py:134-157)

Both are scalar pandas UDFs: one Arrow batch in, one Arrow batch out.
Batch size should be bounded for multi-MB html blobs via
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in session
builders here to 256).
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from website_indexer_spark.functions.extract import extract_page_fields
from website_indexer_spark.functions.urltools import (
    canonicalize_url,
    unwrap_external_site,
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("components", T.ArrayType(T.StringType())),
    ]
)


@pandas_udf(EXTRACTED_SCHEMA)
def extract_udf(html: pd.Series, start_host: pd.Series) -> pd.DataFrame:
    """Vectorized §2.B kernel. NULL html or no-title page => all-NULL
    struct fields (caller drops rows with null title, mirroring
    models.py:125-126)."""
    titles: List[Optional[str]] = []
    languages: List[Optional[str]] = []
    texts: List[Optional[str]] = []
    links: List[Optional[List[str]]] = []
    components: List[Optional[List[str]]] = []
    for blob, host in zip(html, start_host):
        page = None
        if blob is not None:
            if isinstance(blob, (bytes, bytearray)):
                try:
                    decoded = bytes(blob).decode("utf-8")
                except UnicodeDecodeError:
                    decoded = None
            else:
                decoded = blob
            if decoded is not None:
                try:
                    page = extract_page_fields(decoded, host or "")
                except Exception:
                    page = None  # parse-guard, mirrors the reference's
                    # tolerate-and-drop behavior for unparseable pages;
                    # also catches ParseTimeout — the kernel's 5 s
                    # per-document budget (extract.PARSE_BUDGET_S,
                    # reference parser.py:46-58) — so one pathological
                    # page can never stall the Arrow batch's task
        if page is None:
            titles.append(None)
            languages.append(None)
            texts.append(None)
            links.append(None)
            components.append(None)
        else:
            titles.append(page.title)
            languages.append(page.language)
            texts.append(page.text)
            links.append(page.links)
            components.append(page.components)
    return pd.DataFrame(
        {
            "title": titles,
            "language": languages,
            "text": texts,
            "links": links,
            "components": components,
        }
    )


@pandas_udf(T.ArrayType(T.StringType()))
def canonicalize_links_udf(
    page_url: pd.Series, links: pd.Series, start_host: pd.Series
) -> pd.Series:
    """Resolve raw hrefs to absolute canonical URLs for the frontier:
    urljoin against the page URL, fragment strip, host normalization,
    /external-site/ unwrap. Unresolvable hrefs are dropped. Order of
    the input (sorted hrefs, parser.py:115) is preserved."""
    out: List[Optional[List[str]]] = []
    for url, hrefs, host in zip(page_url, links, start_host):
        if hrefs is None:
            out.append(None)
            continue
        resolved: List[str] = []
        seen = set()
        for href in hrefs:
            canon = canonicalize_url(href, url)
            if canon is None:
                continue
            unwrapped = unwrap_external_site(canon, host or "")
            if unwrapped is not canon:
                # unwrap may yield a relative/odd URL — re-canonicalize.
                # Identity returns skip this: the canonical form is a
                # fixed point (pinned by test_properties idempotence),
                # so re-canonicalizing an unchanged URL is a no-op.
                canon = canonicalize_url(unwrapped, url)
            if canon is None or canon in seen:
                continue
            seen.add(canon)
            resolved.append(canon)
        out.append(resolved)
    return pd.Series(out)


def with_url_parts(df, url_col: str = "url"):
    """Native-column URL part extraction (no UDF): host(:port), path,
    query — the inputs of the §2.A policy cascade."""
    url = F.col(url_col)
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    # parse_url has no port accessor that includes default-port logic;
    # extract it from the authority.
    authority = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))
    default_port = F.when(scheme == "http", F.lit("80")).when(
        scheme == "https", F.lit("443")
    )
    host_with_port = F.when(
        (port != "") & (port != default_port), F.concat(host, F.lit(":"), port)
    ).otherwise(host)
    return (
        df.withColumn("host", host_with_port)
        .withColumn("url_path", F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")))
        .withColumn("url_query", F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit("")))
    )
