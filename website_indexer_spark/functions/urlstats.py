"""URL-based quality features and filtering — the UT1-blocklist /
RefinedWeb-style URL gauntlet a web pipeline runs BEFORE fetching or
retaining a document (Penedo et al. 2023 §3.1 filter by URL; C4's
bad-words page filter applied at the URL level).

The reference touches URLs only for crawl policy
(crawler/wpull/plugin.py:60-107 — skip-list, querystring, file
extensions); it has no URL-quality notion. These are engine
additions: pure native Column expressions (regexp + arithmetic), so
the whole feature block is one narrow projection — zero exchanges,
whole-stage codegen — and the filter composes into any scan.

Features (all exactly mirrorable in ANSI SQL / DuckDB):
* url_len       — total characters;
* scheme        — lowercased scheme;
* host          — lowercased authority minus port/userinfo;
* path_depth    — '/' count in the path component;
* digit_ratio   — digits / url_len (single int/int division, so the
                  double is bit-identical across engines);
* n_params      — query parameters ('&'-separated, 0 when no query);
* blocklisted   — host or path contains a blocklist token.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mild, documentation-safe stand-in for the UT1 adult/gambling
# category lists (the real deployment mounts the published lists).
DEFAULT_BLOCKLIST = ["casino", "gambling", "viagra"]

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:@]*@)?([^/?#:]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"


def url_host(url: Column) -> Column:
    """Lowercased host (authority minus userinfo/port)."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 2))


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def url_quality_columns(
    url: Column, blocklist: Optional[List[str]] = None
) -> List[Column]:
    blocklist = DEFAULT_BLOCKLIST if blocklist is None else blocklist
    host = url_host(url)
    path = F.lower(url_path(url))
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    blocked = F.lit(False)
    for tok in blocklist:
        blocked = (
            blocked
            | F.contains(host, F.lit(tok))
            | F.contains(path, F.lit(tok))
        )
    return [
        F.length(url).alias("url_len"),
        F.lower(
            F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
        ).alias("scheme"),
        host.alias("host"),
        (
            F.length(path) - F.length(F.replace(path, F.lit("/"), F.lit("")))
        ).alias("path_depth"),
        (
            F.regexp_count(url, F.lit(r"[0-9]")).cast("double")
            / F.greatest(F.length(url), F.lit(1)).cast("double")
        ).alias("digit_ratio"),
        F.when(query == "", F.lit(0))
        .otherwise(F.size(F.split(query, r"&")))
        .alias("n_params"),
        blocked.alias("blocklisted"),
    ]


def url_quality_filter(
    df: DataFrame,
    url_col: str = "url",
    max_len: int = 2048,
    max_depth: int = 8,
    max_digit_ratio: float = 0.5,
    max_params: int = 8,
    blocklist: Optional[List[str]] = None,
) -> DataFrame:
    """Rows of `df` whose URL passes the gauntlet. Narrow filter —
    pushes to the scan; at 100 TB this runs INSIDE the parquet read
    stage, before any shuffle the downstream pipeline adds."""
    feats = df.select(
        "*", *url_quality_columns(F.col(url_col), blocklist)
    )
    return feats.filter(
        (F.col("url_len") <= max_len)
        & (F.col("path_depth") <= max_depth)
        & (F.col("digit_ratio") <= max_digit_ratio)
        & (F.col("n_params") <= max_params)
        & ~F.col("blocklisted")
    ).select(*df.columns)
