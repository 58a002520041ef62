"""Anchor-text aggregation: the classic web-index "anchor file" —
for every link target, the most common anchor strings pointing at it.

Anchor text is the web's free human labeling (it names the TARGET,
written by the SOURCE author); every large-scale index since the
MapReduce paper's canonical examples aggregates it per target for
ranking and retrieval, and LLM-data pipelines reuse it as a
document-title/quality signal. The reference stores raw (page, href)
link rows (viewer's crawler_link dimension) but computes nothing over
them — this is the derived table a deployment builds from that
dimension plus the <a> element text the extraction kernel walks.

Scale shape:
* normalize → groupBy (target, anchor) with partial aggregation: the
  mega-duplicate anchors ("click here" × 10^9) collapse map-side
  before the exchange, so the shuffle carries distinct pairs only.
* per-target top-k via row_number window: Spark plans a partial
  WindowGroupLimit BELOW the exchange (each map task forwards at most
  k rows per (target) group it saw), so a target with 10^8 distinct
  anchors never funnels them all through one reducer.
* ordering (count desc, anchor asc) is a total order per target —
  (target, anchor) is unique after the groupBy — so top-k is
  deterministic and hash-gateable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_anchor(col):
    """Whitespace-collapse + trim (anchor text arrives with the
    markup's incidental newlines/indentation)."""
    return F.regexp_replace(F.trim(col), r"\s+", " ")


def anchor_text_agg(
    links: DataFrame,
    target_col: str = "dst",
    anchor_col: str = "anchor",
    k: int = 3,
) -> DataFrame:
    """(url, anchor, n_links, rank): each target's top-``k`` anchor
    strings by frequency (ties broken by anchor string asc). Empty /
    whitespace-only anchors are dropped — image links and the like
    carry no text signal."""
    norm = normalize_anchor(F.col(anchor_col))
    counts = (
        links.select(F.col(target_col).alias("url"), norm.alias("anchor"))
        .filter(F.col("anchor") != "")
        .groupBy("url", "anchor")
        .agg(F.count("*").alias("n_links"))
    )
    w = Window.partitionBy("url").orderBy(
        F.desc("n_links"), F.asc("anchor")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
