"""Host-level quality gating (RefinedWeb/C4-style domain curation).

Web-corpus curation filters at two granularities: per-document
(functions/textstats.py quality_filter, the Gopher repetition gate)
and per-HOST — a domain whose pages are on average short, boilerplate
or machine-generated is dropped wholesale, cheap pages included,
because document signals are noisy one page at a time but sharp in
aggregate (RefinedWeb §3.1's URL/domain stage, C4's domain blocklist).

Shape at 100 TB:
* ``host_stats`` is one partial-aggregated exchange keyed by host —
  the reduction is count/sum only, so mega-hosts (the crawl-skew
  villains, same skew story as the politeness ledger in
  operators/frontier.py) cost map-side combine, not a hot reducer;
* the verdict table has one row per HOST (10^7-10^8 rows at web
  scale, ~2 orders below the page table), so the gate-back join is
  an equi-join on host that AQE turns into a broadcast whenever the
  surviving-host list fits — and the join is LEFT SEMI, so no
  columns widen and no row multiplies.

Float protocol for the oracle gate: means/fractions are emitted as a
single IEEE division of two exactly-represented bigints
(``sum::double / count``), never an incremental average — both
engines perform the identical one division, so the doubles are
bit-equal and hash-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from website_indexer_spark.functions.textstats import whitespace_token_count

DEFAULT_SHORT_TOKENS = 50
DEFAULT_MIN_DOCS = 3
DEFAULT_MIN_MEAN_TOKENS = 52.0
DEFAULT_MAX_SHORT_FRAC = 0.40


def host_stats(
    df: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    short_tokens: int = DEFAULT_SHORT_TOKENS,
) -> DataFrame:
    """(host, n_docs, sum_tokens, n_short, mean_tokens, short_frac)
    — one row per host. NULL hosts are kept as their own group (a
    crawl row with no attributed host is itself a signal); the
    gate-back join below handles them null-safely."""
    toks = df.select(
        F.col(host_col).alias("host"),
        whitespace_token_count(F.col(text_col)).cast("bigint").alias("nt"),
    )
    agg = toks.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("sum_tokens"),
        F.sum(
            F.when(F.col("nt") < F.lit(short_tokens), 1).otherwise(0)
        ).cast("bigint").alias("n_short"),
    )
    return agg.select(
        "host",
        "n_docs",
        "sum_tokens",
        "n_short",
        (F.col("sum_tokens").cast("double") / F.col("n_docs")).alias(
            "mean_tokens"
        ),
        (F.col("n_short").cast("double") / F.col("n_docs")).alias(
            "short_frac"
        ),
    )


def host_quality_filter(
    df: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    short_tokens: int = DEFAULT_SHORT_TOKENS,
    min_docs: int = DEFAULT_MIN_DOCS,
    min_mean_tokens: float = DEFAULT_MIN_MEAN_TOKENS,
    max_short_frac: float = DEFAULT_MAX_SHORT_FRAC,
) -> DataFrame:
    """Rows of ``df`` whose host passes the aggregate gate. A host
    passes when it has at least ``min_docs`` documents AND mean token
    count >= ``min_mean_tokens`` AND at most ``max_short_frac`` of
    its documents under ``short_tokens`` tokens. Hosts below
    ``min_docs`` are dropped (not enough evidence to trust — the
    conservative curation default). NULL-host rows never pass (an
    IS NOT NULL term, so three-valued logic can't leak them through
    the semi-join)."""
    stats = host_stats(df, host_col, text_col, short_tokens)
    good = stats.where(
        F.col("host").isNotNull()
        & (F.col("n_docs") >= F.lit(min_docs))
        & (F.col("mean_tokens") >= F.lit(float(min_mean_tokens)))
        & (F.col("short_frac") <= F.lit(float(max_short_frac)))
    ).select(F.col("host").alias(host_col))
    return df.join(good, host_col, "left_semi")


__all__ = [
    "host_stats",
    "host_quality_filter",
    "DEFAULT_SHORT_TOKENS",
    "DEFAULT_MIN_DOCS",
    "DEFAULT_MIN_MEAN_TOKENS",
    "DEFAULT_MAX_SHORT_FRAC",
]
