"""Synthetic corpus generator tests + Spark-vs-oracle equivalence on a
generated site (the full pipeline over a corpus exercising every
policy rule at once)."""

import pytest

from tests.oracle_crawler import WebResponse, crawl as oracle_crawl
from tests.test_crawl import _assert_equivalent
from website_indexer_spark.plans.crawl import run_crawl
from website_indexer_spark.sources.synth import generate_web_pages, host_boundaries


def test_host_boundaries_zipf():
    b = host_boundaries(1000, 10)
    sizes = [b[i + 1] - b[i] for i in range(10)]
    assert sum(sizes) == 1000
    assert sizes[0] > sizes[1] > sizes[4]  # mega-host skew
    assert all(s >= 1 for s in sizes)


@pytest.mark.slow
def test_generator_deterministic(spark):
    a = generate_web_pages(spark, n_pages=200, n_hosts=5, partitions=4)
    b = generate_web_pages(spark, n_pages=200, n_hosts=5, partitions=7)
    ra = sorted((r["url"], r["text"]) for r in a.collect())
    rb = sorted((r["url"], r["text"]) for r in b.collect())
    assert ra == rb  # identical regardless of partitioning
    urls = [u for u, _ in ra]
    assert len(urls) == len(set(urls))


@pytest.mark.slow
def test_spark_crawl_synth_site_matches_oracle(spark, tmp_path):
    web_df = generate_web_pages(spark, n_pages=300, n_hosts=6, partitions=4).persist()
    rows = web_df.collect()
    web = {
        r["url"]: WebResponse(
            html=bytes(r["html"]) if r["html"] is not None else None,
            status_code=r["status_code"],
            location=r["location"],
            content_type=r["content_type"],
        )
        for r in rows
    }
    seed = "https://host0.test/p0/"
    oracle = oracle_crawl(web, seed)
    assert len(oracle.pages) > 50  # the mega-host tree is reachable
    assert len(oracle.errors) > 0
    assert len(oracle.redirects) > 0

    result = run_crawl(spark, web_df, seed, str(tmp_path / "crawl"))
    _assert_equivalent(result, result.store, oracle)
