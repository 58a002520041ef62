"""WARC ingestion (Common Crawl's native format → the web_pages input
table), driven against the reference's OWN wget-written archive
(/root/reference/sample/crawl.warc.gz). The archive predates one edit
to the sample homepage, so the byte-identity anchor is the child page
(its source is identical to sample/src); the homepage still proves the
HTTP/WARC framing parse."""

import datetime
import gzip
import os

import pytest

from website_indexer_spark.sources import warc as W

REF_WARC = "/root/reference/sample/crawl.warc.gz"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_WARC), reason="reference sample warc absent"
)


def _blob():
    return open(REF_WARC, "rb").read()


def test_pure_parse_of_reference_archive():
    recs = list(W.iter_warc_records(_blob()))
    types = [h.get("warc-type") for h, _ in recs]
    assert types.count("response") == 2 and "warcinfo" in types

    rows = list(W.warc_file_to_rows(_blob()))
    assert [r[0] for r in rows] == [
        "http://localhost:8000/",
        "http://localhost:8000/child/",
    ]
    for url, ts, html, text, lang, status, location, ctype in rows:
        assert status == 200 and ctype == "text/html"
        assert text is None and lang is None and location is None
        assert isinstance(ts, datetime.datetime) and ts.year == 2022
        assert html and b"<html" in html

    # the child body is byte-identical to the committed site source
    child_src = open(
        "/root/reference/sample/src/child/index.html", "rb"
    ).read()
    assert rows[1][2] == child_src


def test_parser_hostility():
    # non-gzip garbage, no WARC magic: no records, no raise
    assert list(W.iter_warc_records(b"not a warc at all")) == []
    # truncated archive: complete prefix survives, torn tail dropped
    data = gzip.decompress(_blob())
    cut = data[: int(len(data) * 0.6)]
    full = list(W.iter_warc_records(data))
    part = list(W.iter_warc_records(cut))
    assert 0 < len(part) < len(full)
    assert part == full[: len(part)]
    # bad content-length: stops cleanly
    assert list(W.iter_warc_records(b"WARC/1.0\r\nContent-Length: x\r\n\r\n")) == []
    # non-HTTP payload routed out
    assert W.parse_http_response(b"just bytes") is None


def test_read_warc_and_crawl_matches_reference_db(spark, tmp_path):
    """The full loop: WARC archive → web_pages table → BFS crawl →
    extracted pages; the child page's text must equal the reference
    DB row (byte-identity through the WHOLE pipeline from the real
    archive)."""
    import sqlite3

    from website_indexer_spark.plans.crawl import run_crawl
    from website_indexer_spark.sources.tables import load_web_pages

    web = W.read_warc(spark, REF_WARC)
    rows = {r["url"]: r for r in web.collect()}
    assert set(rows) == {
        "http://localhost:8000/",
        "http://localhost:8000/child/",
    }

    # persist like a snapshot ingest, then crawl against the table
    path = str(tmp_path / "web_pages")
    web.write.parquet(path)
    result = run_crawl(
        spark,
        load_web_pages(spark, path),
        "http://localhost:8000/",
        str(tmp_path / "c"),
    )
    pages = {r["url"]: r for r in result.store.read_all("pages").collect()}
    assert set(pages) == set(rows)  # both archive pages crawled

    db = "/root/reference/sample/sample.sqlite3"
    if os.path.exists(db):
        con = sqlite3.connect(db)
        (want_text,) = con.execute(
            "SELECT text FROM crawler_page WHERE url = ?",
            ("http://localhost:8000/child/",),
        ).fetchone()
        con.close()
        assert pages["http://localhost:8000/child/"]["text"] == want_text
    assert pages["http://localhost:8000/"]["title"] == "Sample homepage"


# ---------------- ADVICE r3: wire-format bodies + WARC 1.1 dates -----


def _http(status_line, headers, body):
    head = status_line + "".join(f"\r\n{k}: {v}" for k, v in headers)
    return head.encode() + b"\r\n\r\n" + body


def test_parse_http_response_chunked():
    from website_indexer_spark.sources.warc import parse_http_response

    body = b"4\r\nWiki\r\n6\r\npedia \r\nA;ext=1\r\nin chunks.\r\n0\r\n\r\n"
    got = parse_http_response(
        _http("HTTP/1.1 200 OK", [("Transfer-Encoding", "chunked")], body)
    )
    assert got is not None
    status, headers, out = got
    assert status == 200 and out == b"Wikipedia in chunks."
    # broken framing: record dropped, not shipped corrupt
    assert (
        parse_http_response(
            _http(
                "HTTP/1.1 200 OK",
                [("Transfer-Encoding", "chunked")],
                b"ZZ\r\nnot hex\r\n",
            )
        )
        is None
    )
    # truncated chunk
    assert (
        parse_http_response(
            _http(
                "HTTP/1.1 200 OK",
                [("Transfer-Encoding", "chunked")],
                b"FF\r\nshort",
            )
        )
        is None
    )


def test_parse_http_response_gzip_and_chunked_gzip():
    import gzip as _gz

    from website_indexer_spark.sources.warc import parse_http_response

    html = b"<html><title>z</title>compressed body</html>"
    gz = _gz.compress(html)
    got = parse_http_response(
        _http("HTTP/1.1 200 OK", [("Content-Encoding", "gzip")], gz)
    )
    assert got is not None and got[2] == html
    # chunked THEN gzip (transfer coding applied over the content coding)
    chunked = (
        hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    )
    got2 = parse_http_response(
        _http(
            "HTTP/1.1 200 OK",
            [("Transfer-Encoding", "chunked"), ("Content-Encoding", "gzip")],
            chunked,
        )
    )
    assert got2 is not None and got2[2] == html
    # corrupt gzip: dropped
    assert (
        parse_http_response(
            _http("HTTP/1.1 200 OK", [("Content-Encoding", "gzip")], b"\x1f\x8bxx")
        )
        is None
    )


def test_parse_http_response_deflate():
    import zlib

    from website_indexer_spark.sources.warc import parse_http_response

    html = b"<p>deflated</p>"
    raw = zlib.compressobj(wbits=-15)
    variants = [
        zlib.compress(html),                     # RFC 1950 zlib wrapper
        raw.compress(html) + raw.flush(),        # raw deflate (some servers)
    ]
    for enc in variants:
        got = parse_http_response(
            _http("HTTP/1.1 200 OK", [("Content-Encoding", "deflate")], enc)
        )
        assert got is not None and got[2] == html
    assert (
        parse_http_response(
            _http("HTTP/1.1 200 OK", [("Content-Encoding", "deflate")], b"junk!")
        )
        is None
    )


def test_parse_warc_date_fractional():
    from website_indexer_spark.sources.warc import _parse_warc_date

    d0 = _parse_warc_date("2024-01-02T03:04:05Z")
    d1 = _parse_warc_date("2024-01-02T03:04:05.678901Z")
    assert d0 is not None and d1 is not None
    assert d1.microsecond == 678901
    assert _parse_warc_date("not a date") is None


def test_warc_ingest_gate_matches_duckdb(spark):
    """The driver's warc_ingest oracle gate, pinned as a pytest:
    synthetic archives (chunked/gzip/identity, redirects, WARC 1.1
    dates, warcinfo records, gzip+plain shards) decode back to exactly
    the table DuckDB reconstructs from the source rows."""
    import duckdb

    from website_indexer_spark.plans.catalog import ORACLE_SQL, SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    spdf = (
        SPARK_QUERIES["warc_ingest"](spark, sf)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    odf = (
        con.execute(ORACLE_SQL["warc_ingest"])
        .df()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(spdf) == len(odf) > 0
    for c in spdf.columns:
        a = spdf[c].fillna("~N~").astype(str)
        b = odf[c].fillna("~N~").astype(str)
        assert (a == b).all(), c
    # the encodings really were exercised
    from website_indexer_spark.sources.warc import synth_warc_plan

    plans = [synth_warc_plan(i) for i in range(50)]
    assert {p["encoding"] for p in plans} == {"chunked", "gzip", "identity"}
    assert any(p["redirect"] for p in plans)
    assert any(p["frac_date"] for p in plans)
