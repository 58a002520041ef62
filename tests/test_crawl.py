"""Crawl-equivalence tests: the Spark superstep driver must produce the
same pages/errors/redirects/seen sets as the simulated-reference
oracle (tests/oracle_crawler.py), which itself is validated against
the reference's committed fixture (crawler/fixtures/sample.json).
"""

import pytest

from tests.conftest import web_dict_to_df
from tests.oracle_crawler import WebResponse, crawl as oracle_crawl, fixture_site
from website_indexer_spark.plans.crawl import run_crawl


# --------------------------------------------------------------------
# Oracle self-validation against the reference fixture goldens
# --------------------------------------------------------------------

def test_oracle_matches_reference_fixture():
    web, seed = fixture_site()
    result = oracle_crawl(web, seed)

    assert sorted(result.pages) == [
        "http://localhost:8000/",
        "http://localhost:8000/child/",
        "http://localhost:8000/child/?page=2",
    ]
    home = result.pages["http://localhost:8000/"]
    assert home["title"] == "Sample homepage"
    assert home["components"] == ["o-sample"]
    assert len(home["links"]) == 8

    assert [(e["url"], e["status_code"]) for e in result.errors] == [
        ("https://example.com/file.xlsx", 404)
    ]
    assert result.redirects == []
    # requested includes external one-hop probes
    assert set(result.requested) == {
        "http://localhost:8000/",
        "http://localhost:8000/child/",
        "http://localhost:8000/child/?page=2",
        "https://example.com/",
        "https://example.com/file.xlsx",
        "https://example.org/",
    }
    # BFS: seed at depth 0, everything else depth 1
    depths = dict((u, d) for d, u in result.visit_order)
    assert depths["http://localhost:8000/"] == 0
    assert all(d == 1 for u, d in depths.items() if u != "http://localhost:8000/")


def _spark_crawl(spark, tmp_path, web, seed, **kw):
    web_df = web_dict_to_df(spark, web)
    return run_crawl(spark, web_df, seed, str(tmp_path / "crawl"), **kw)


def _assert_equivalent(result, store, oracle):
    pages = {r["url"]: r.asDict() for r in store.read_all("pages").collect()}
    errors = {
        (r["url"], r["status_code"], r["referrer"])
        for r in store.read_all("errors").collect()
    }
    redirects = {
        (r["url"], r["status_code"], r["location"])
        for r in store.read_all("redirects").collect()
    }
    seen = {r["url"] for r in store.read_all("seen").collect()}

    assert set(pages) == set(oracle.pages), (
        sorted(set(pages) ^ set(oracle.pages))
    )
    for url, expected in oracle.pages.items():
        got = pages[url]
        assert got["title"] == expected["title"], url
        assert got["language"] == expected["language"], url
        assert got["text"] == expected["text"], url  # byte-identical
        assert got["links"] == expected["links"], url
        assert got["components"] == expected["components"], url
        assert got["depth"] == expected["depth"], url
    assert errors == {
        (e["url"], e["status_code"], e["referrer"]) for e in oracle.errors
    }
    assert redirects == {
        (r["url"], r["status_code"], r["location"]) for r in oracle.redirects
    }
    assert seen == set(oracle.requested)


# --------------------------------------------------------------------
# Spark driver vs oracle on the fixture site
# --------------------------------------------------------------------

@pytest.mark.slow
def test_spark_crawl_fixture_site(spark, tmp_path):
    web, seed = fixture_site()
    oracle = oracle_crawl(web, seed)
    result = _spark_crawl(spark, tmp_path, web, seed)
    _assert_equivalent(result, result.store, oracle)
    assert result.supersteps == 2  # depth 0 wave + depth 1 wave
    assert result.pages == 3
    assert result.errors == 1


# --------------------------------------------------------------------
# Richer synthetic site: redirects (http->https, append-slash,
# cross-host), network errors, non-HTML, depth caps, max_pages
# --------------------------------------------------------------------

def _rich_site():
    H = "site.test"
    mk = lambda body, title="T": (  # noqa: E731
        f'<html lang="en"><head><title>{title}</title></head>'
        f"<body>{body}</body></html>"
    ).encode()
    web = {
        f"https://{H}/": WebResponse(
            html=mk(
                '<a href="/a/">a</a> <a href="/b/">b</a> '
                '<a href="http://site.test/sec/">sec</a> '
                '<a href="/missing-slash">ms</a> '
                '<a href="/gone/">gone</a> '
                '<a href="/oops/">oops</a> '
                '<a href="/binary/">bin</a> '
                '<a href="https://other.test/x/">ext</a> '
                '<a href="https://www.facebook.com/dialog/share?u=1">skip</a> '
                '<a href="/external-site/?ext_url=https%3A%2F%2Ffar.test%2F">wrap</a>',
                "Home",
            )
        ),
        f"https://{H}/a/": WebResponse(
            html=mk('<a href="/deep/">deep</a> <a href="/">home</a>', "A")
        ),
        f"https://{H}/b/": WebResponse(html=mk("no links", "B")),
        # http->https redirect (C13 is_http_to_https material)
        f"http://{H}/sec/": WebResponse(
            html=None, status_code=301, location=f"https://{H}/sec/"
        ),
        f"https://{H}/sec/": WebResponse(html=mk("secure", "Sec")),
        # append-slash redirect
        f"https://{H}/missing-slash": WebResponse(
            html=None, status_code=301, location=f"https://{H}/missing-slash/"
        ),
        f"https://{H}/missing-slash/": WebResponse(html=mk("slashed", "MS")),
        f"https://{H}/gone/": WebResponse(html=None, status_code=404),
        f"https://{H}/oops/": WebResponse(html=None, status_code=200),  # net error
        f"https://{H}/binary/": WebResponse(
            html=b"\x89PNG", content_type="image/png"
        ),
        f"https://{H}/deep/": WebResponse(html=mk("deep page", "Deep")),
        "https://other.test/x/": WebResponse(html=mk("external ok")),
        "https://far.test/": WebResponse(html=None, status_code=500),
        # cross-host redirect: recorded, location NOT followed
        # (linked from /a/? add to home page instead)
    }
    # add a cross-host redirect linked from home
    web[f"https://{H}/away/"] = WebResponse(
        html=None, status_code=302, location="https://elsewhere.test/landing/"
    )
    home_html = web[f"https://{H}/"].html.decode()
    web[f"https://{H}/"] = WebResponse(
        html=home_html.replace(
            "</body>", '<a href="/away/">away</a></body>'
        ).encode()
    )
    return web, f"https://{H}/"


@pytest.mark.slow
def test_spark_crawl_rich_site(spark, tmp_path):
    web, seed = _rich_site()
    oracle = oracle_crawl(web, seed)
    # sanity: the oracle exercises every routing branch
    assert any(r["status_code"] == 301 for r in oracle.redirects)
    assert any(r["status_code"] == 302 for r in oracle.redirects)
    assert any(e["status_code"] == 0 for e in oracle.errors)
    assert any(e["status_code"] == 404 for e in oracle.errors)
    assert "https://elsewhere.test/landing/" not in oracle.requested  # not followed

    result = _spark_crawl(spark, tmp_path, web, seed)
    _assert_equivalent(result, result.store, oracle)


@pytest.mark.slow
def test_spark_crawl_depth_cap(spark, tmp_path):
    web, seed = _rich_site()
    oracle = oracle_crawl(web, seed, depth_cap=1)
    result = _spark_crawl(spark, tmp_path, web, seed, depth_cap=1)
    _assert_equivalent(result, result.store, oracle)
    # /deep/ is at depth 2 — must be excluded
    assert "https://site.test/deep/" not in {
        r["url"] for r in result.store.read_all("pages").collect()
    }


@pytest.mark.slow
def test_spark_crawl_max_pages(spark, tmp_path):
    web, seed = _rich_site()
    oracle = oracle_crawl(web, seed, max_pages=4)
    result = _spark_crawl(spark, tmp_path, web, seed, max_pages=4)
    assert result.requested == 4
    _assert_equivalent(result, result.store, oracle)


@pytest.mark.slow
def test_spark_crawl_resume(spark, tmp_path):
    """Kill-and-resume: delete the last superstep's manifest, resume,
    and require the final state to equal an uninterrupted run."""
    web, seed = _rich_site()
    oracle = oracle_crawl(web, seed)

    result = _spark_crawl(spark, tmp_path, web, seed)
    store = result.store
    last = store.last_committed()
    assert last >= 1

    # simulate a crash after superstep last-1: drop the last manifest
    import os

    os.remove(store._manifest_path(last))
    resumed = run_crawl(
        spark,
        web_dict_to_df(spark, web),
        seed,
        str(tmp_path / "crawl"),
        resume=True,
    )
    _assert_equivalent(resumed, resumed.store, oracle)


@pytest.mark.slow
def test_spark_crawl_politeness_budget(spark, tmp_path):
    """With a per-host budget the crawl takes more supersteps but must
    reach the identical final state (ordering-internal change only)."""
    web, seed = _rich_site()
    oracle = oracle_crawl(web, seed)
    result = _spark_crawl(spark, tmp_path, web, seed, host_budget=2)
    assert result.supersteps > 2
    _assert_equivalent(result, result.store, oracle)


@pytest.mark.slow
def test_spark_crawl_bloom_path(spark, tmp_path):
    """Bloom prefilter on: exact same final state (bloom only skips
    definitely-unseen fast path; correctness must be unaffected)."""
    web, seed = _rich_site()
    oracle = oracle_crawl(web, seed)
    result = _spark_crawl(
        spark, tmp_path, web, seed, use_bloom=True, bloom_bits=1 << 16
    )
    _assert_equivalent(result, result.store, oracle)


@pytest.mark.slow
def test_spark_crawl_dimension_tables(spark, tmp_path):
    """A17 persistent form: the materialized dim_components/dim_links
    tables must equal the distinct key sets derivable from the pages
    table, and per-superstep deltas must be append-new-keys-only
    (disjoint across supersteps — the MERGE contract)."""
    web, seed = fixture_site()
    result = _spark_crawl(spark, tmp_path, web, seed)
    store = result.store

    pages = store.read_all("pages").collect()
    expect_components = {c for r in pages for c in (r["components"] or [])}
    expect_links = {h for r in pages for h in (r["links"] or [])}
    assert expect_components and expect_links  # fixture exercises both

    dim_c = [r["class_name"] for r in store.read_all("dim_components").collect()]
    dim_l = [r["href"] for r in store.read_all("dim_links").collect()]
    assert set(dim_c) == expect_components
    assert set(dim_l) == expect_links
    # unique by construction: MERGE never re-appends an existing key
    assert len(dim_c) == len(set(dim_c))
    assert len(dim_l) == len(set(dim_l))

    # deltas are disjoint across supersteps (unified dims layout:
    # dims/superstep=K/kind=link)
    import os

    seen_keys = set()
    for k in range(store.last_committed() + 1):
        path = os.path.join(store.root, "dims", f"superstep={k}", "kind=link")
        delta = (
            {r["key"] for r in spark.read.parquet(path).collect()}
            if os.path.isdir(path)
            else set()
        )
        assert not (delta & seen_keys)
        seen_keys |= delta
        assert store.read_manifest(k)["counters"]["links_new"] == len(delta)

    # C10 off the dimension == C10 re-derived from pages
    from website_indexer_spark.plans.queries import (
        component_list,
        component_list_from_dim,
    )

    from_dim = [
        r["class_name"]
        for r in component_list_from_dim(store.read_all("dim_components")).collect()
    ]
    from_pages = [
        r["class_name"] for r in component_list(store.read_all("pages")).collect()
    ]
    assert from_dim == from_pages


def test_dim_upsert_delta_paths(spark):
    """Broadcast and shuffle formulations of the MERGE delta agree."""
    from website_indexer_spark.operators.dims import dim_upsert_delta

    existing = spark.createDataFrame([(k,) for k in "abc"], "key string")
    incoming = spark.createDataFrame(
        [(k,) for k in ["b", "c", "d", "d", "e", None]], "key string"
    )
    for bcast in (True, False):
        out = sorted(
            r["key"]
            for r in dim_upsert_delta(
                existing, incoming, "key", broadcast_incoming=bcast
            ).collect()
        )
        assert out == ["d", "e"]
