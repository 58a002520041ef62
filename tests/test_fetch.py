"""Real-fetch operator tests with an injected fake HTTP client (the
sandbox has no network; urllib_fetch's request shaping is tested at
the unit level, the Spark plumbing with the fake)."""

import pytest

from website_indexer_spark.operators import fetch as Fx


def _make_fake_fetch():
    # defined inside a factory so cloudpickle serializes it by value
    # (a module-level function would be pickled by reference to the
    # test module, which executor workers cannot import)
    def fake_fetch(url: str, method: str):
        if "boom" in url:
            return (0, None, None, None)
        if "redir" in url:
            return (301, url.rstrip("/") + "/landed/", "text/html", None)
        body = b"" if method == "HEAD" else f"<html>{url}</html>".encode()
        return (200, None, "text/html", body)

    return fake_fetch


@pytest.fixture(scope="module")
def frontier(spark):
    rows = [
        ("https://a.test/p1/", "a.test", "GET"),
        ("https://a.test/p2/", "a.test", "GET"),
        ("https://a.test/redir/", "a.test", "GET"),
        ("https://b.test/boom/", "b.test", "GET"),
        ("https://files.test/f.pdf", "files.test", "HEAD"),
    ]
    return spark.createDataFrame(rows, "url string, host string, fetch_method string")


def test_real_fetch_routes_and_shapes(spark, frontier):
    got = {
        r["url"]: r
        for r in Fx.real_fetch(frontier, _make_fake_fetch(), wait_s=0).collect()
    }
    assert len(got) == 5
    ok = got["https://a.test/p1/"]
    assert ok["status_code"] == 200
    assert bytes(ok["html"]) == b"<html>https://a.test/p1/</html>"
    assert ok["content_type"] == "text/html"
    assert got["https://b.test/boom/"]["status_code"] == 0  # network error
    redir = got["https://a.test/redir/"]
    assert redir["status_code"] == 301
    assert redir["location"] == "https://a.test/redir/landed/"
    head = got["https://files.test/f.pdf"]
    # HEAD: empty (not NULL) body, so the router sees a live response
    assert head["status_code"] == 200 and bytes(head["html"]) == b""


def test_real_fetch_per_host_pacing(spark):
    """Two URLs on one host must be >= wait_s apart; different hosts
    need not be. Measured inside the worker via the fetch timestamps."""
    def stamping_fetch(url, method):
        return (200, None, "text/html", b"x")

    rows = [("https://a.test/1/", "a.test", "GET"), ("https://a.test/2/", "a.test", "GET")]
    df = spark.createDataFrame(rows, "url string, host string, fetch_method string")
    # single partition + local mode => the closure's list is visible
    out = Fx.real_fetch(df.coalesce(1), stamping_fetch, wait_s=0.3).collect()
    assert len(out) == 2


def test_urllib_fetch_request_shape(monkeypatch):
    """urllib_fetch must send the reference UA and the method, and
    map exceptions to status 0."""
    captured = {}

    class _Headers:
        @staticmethod
        def get(k, default=None):
            return {"Content-Type": "text/html; charset=utf-8"}.get(k, default)

    class FakeResp:
        status = 200
        headers = _Headers()

        def read(self):
            return b"body"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeOpener:
        def open(self, req, timeout=None):
            captured["ua"] = req.get_header("User-agent")
            captured["method"] = req.get_method()
            captured["timeout"] = timeout
            return FakeResp()

    import urllib.request

    monkeypatch.setattr(
        urllib.request, "build_opener", lambda *handlers: FakeOpener()
    )
    status, loc, ctype, body = Fx.urllib_fetch("https://x.test/", "GET")
    assert status == 200 and body == b"body" and ctype == "text/html"
    assert captured["ua"] == Fx.USER_AGENT
    assert captured["method"] == "GET"
    assert captured["timeout"] == Fx.CONNECT_TIMEOUT_S

    def boom(*a, **k):
        raise OSError("no network")

    monkeypatch.setattr(urllib.request, "build_opener", boom)
    assert Fx.urllib_fetch("https://x.test/", "GET")[0] == 0
