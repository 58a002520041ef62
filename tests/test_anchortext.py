"""Anchor-text aggregation (operators/anchortext.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from website_indexer_spark.operators.anchortext import anchor_text_agg

LINKS = [
    # (dst, anchor)
    ("https://t/a", "click here"),
    ("https://t/a", "  click\n  here "),   # normalizes to the same
    ("https://t/a", "Consumer Guide"),
    ("https://t/a", "Consumer Guide"),
    ("https://t/a", "Consumer Guide"),
    ("https://t/a", "apply now"),
    ("https://t/a", "zz single"),
    ("https://t/a", ""),                   # dropped
    ("https://t/a", "   "),                # dropped
    ("https://t/b", "b anchor"),
]


@pytest.fixture(scope="module")
def links(spark):
    return spark.createDataFrame(LINKS, ["dst", "anchor"])


def test_topk_counts_and_order(spark, links):
    rows = (
        anchor_text_agg(links, k=3)
        .filter(F.col("url") == "https://t/a")
        .orderBy("rank")
        .collect()
    )
    assert [(r["anchor"], r["n_links"], r["rank"]) for r in rows] == [
        ("Consumer Guide", 3, 1),
        ("click here", 2, 2),      # whitespace variants merged
        ("apply now", 1, 3),       # count tie broken by anchor asc
    ]


def test_k_cut_and_other_targets(spark, links):
    out = anchor_text_agg(links, k=2).collect()
    per_a = [r for r in out if r["url"] == "https://t/a"]
    assert len(per_a) == 2
    per_b = [r for r in out if r["url"] == "https://t/b"]
    assert [(r["anchor"], r["rank"]) for r in per_b] == [("b anchor", 1)]


def test_empty_anchors_never_surface(spark, links):
    out = anchor_text_agg(links, k=10).collect()
    assert all(r["anchor"].strip() for r in out)


def test_plan_partial_agg_and_group_limit(spark, links):
    p = (
        anchor_text_agg(links, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial" in p.lower()          # map-side combine on pairs
    assert "WindowGroupLimit" in p         # top-k pushed below the exchange
    assert "CartesianProduct" not in p
