"""The closed crawl→index→schedule→invalidate→re-fetch loop
(operators/recrawl.py — r4 verdict item 5): with the cuckoo filter
forced on, scheduling a recrawl evicts the chosen URLs from BOTH the
approximate prefilter (stripe-local delete, NO rebuild) and the
committed seen table (bucket-pruned rewrite), and a resumed crawl
with the reseeded frontier refetches exactly those URLs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_crawl import _rich_site, _spark_crawl
from website_indexer_spark.operators.cuckoo import StripedCuckoo
from website_indexer_spark.operators.recrawl import (
    recrawl_invalidate,
    recrawl_seed_frontier,
)
from website_indexer_spark.plans.crawl import run_crawl
from website_indexer_spark.sources.cdx import cdx_change_rate, recrawl_topk


def _capture_index(spark, urls, changed):
    """Two captures per URL (m = 1 revisit interval); URLs in
    ``changed`` flip their digest between captures (X = 1 → positive
    change rate), the rest stay identical (X = 0 → rate 0)."""
    import hashlib

    rows = []
    for u in urls:
        surt = u.lower()
        d0 = "sha1:" + hashlib.md5(u.encode()).hexdigest()[:8]
        d1 = d0 + "x" if u in changed else d0
        rows.append((surt, "20240101000000", u, d0))
        rows.append((surt, "20240201000000", u, d1))
    return spark.createDataFrame(rows, ["surt", "ts14", "url", "digest"])


@pytest.mark.slow
def test_crawl_index_recrawl_refetch_cuckoo(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    web, seed = _rich_site()
    result = _spark_crawl(
        spark, tmp_path, web, seed, use_bloom=True, seen_filter="cuckoo"
    )
    store = result.store
    root = str(tmp_path / "crawl")

    page_urls = sorted(
        r["url"] for r in store.read_all("pages").select("url").collect()
    )
    assert len(page_urls) >= 4
    scheduled = set(page_urls[1:3])  # two non-seed pages

    # index the capture history; only the scheduled pair changed
    rates = cdx_change_rate(
        _capture_index(spark, page_urls, scheduled),
        now_epoch=1_720_000_000,
    )
    topk = recrawl_topk(rates, 2)
    assert {r["url"] for r in topk.collect()} == scheduled

    cuckoo0 = StripedCuckoo.load(root)
    assert cuckoo0 is not None
    v0, k0 = cuckoo0.version, cuckoo0.built_keys
    shape0 = (cuckoo0.n_stripes, cuckoo0.n_slots)

    stats = recrawl_invalidate(spark, store, topk)
    assert stats["filter_kind"] == "cuckoo"
    assert stats["keys"] == 2
    assert stats["filter_removed"] == 2
    assert stats["seen_removed"] == 2
    assert stats["buckets_rewritten"] >= 1

    # committed seen set: scheduled gone, everything else intact
    seen_after = {r["url"] for r in store.read_all("seen").collect()}
    assert not (scheduled & seen_after)
    assert set(page_urls) - scheduled <= seen_after

    # the filter was EDITED, never rebuilt (same table shape, fewer
    # keys, bumped version) — the feature that justifies the cuckoo
    cuckoo1 = StripedCuckoo.load(root)
    assert (cuckoo1.n_stripes, cuckoo1.n_slots) == shape0
    assert cuckoo1.version > v0
    assert cuckoo1.built_keys == k0 - 2

    # re-fetch: resumed crawl with the reseeded frontier requests
    # EXACTLY the scheduled URLs again (their links are all seen)
    reseed = recrawl_seed_frontier(topk)
    res2 = run_crawl(
        spark,
        _web_df(spark, web),
        seed,
        root,
        resume=True,
        extra_frontier=reseed,
        use_bloom=True,
        seen_filter="cuckoo",
    )
    assert res2.requested == result.requested + 2
    seen_final = {r["url"] for r in store.read_all("seen").collect()}
    assert scheduled <= seen_final

    # the refetch produced fresh page rows for the scheduled URLs
    # (routed is append-only lineage: one row per fetch)
    counts = {
        r["url"]: r["n"]
        for r in store.read_all("pages")
        .groupBy("url")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for u in page_urls:
        assert counts[u] == (2 if u in scheduled else 1), u


def _web_df(spark, web):
    from tests.conftest import web_dict_to_df

    return web_dict_to_df(spark, web)
