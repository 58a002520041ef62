"""WAT sink/source (sources/wat.py): envelope determinism, byte-level
record framing, lenient envelope decode, and the Spark round trip."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from website_indexer_spark.sources.wat import (
    read_wat,
    wat_envelope,
    wat_file_to_rows,
    wat_record_bytes,
    write_wat,
)

ROWS = [
    ("https://a.test/1", "2024-01-01 00:00:00", "Page One",
     ["https://a.test/2", "https://b.test/3"]),
    ("https://a.test/2", "2024-01-01 00:00:37", "héllo 中文",
     ["https://a.test/1", "https://a.test/1"]),  # duplicate link kept
    ("https://b.test/3", "2024-02-03 04:05:06", None, []),
    ("https://b.test/4", "2024-12-31 23:59:59", "", ["https://a.test/1"]),
]


@pytest.fixture(scope="module")
def pages(spark):
    df = spark.createDataFrame(ROWS, ["url", "ts", "title", "links"])
    return df.select(
        "url", F.col("ts").cast("timestamp").alias("warc_ts"),
        "title", "links",
    )


def test_envelope_is_deterministic_and_cc_shaped():
    a = wat_envelope("https://x.test", "2024-01-01T00:00:00Z", "T", ["u1"])
    b = wat_envelope("https://x.test", "2024-01-01T00:00:00Z", "T", ["u1"])
    assert a == b
    env = json.loads(a)["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == "https://x.test"
    meta = env["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert meta["Head"]["Title"] == "T"
    assert meta["Links"] == [{"path": "A@/href", "url": "u1"}]
    # None title -> no Title key (CC pages without <title>)
    no_t = wat_envelope("https://x.test", "2024-01-01T00:00:00Z", None, [])
    assert "Title" not in json.loads(no_t)["Envelope"]["Payload-Metadata"][
        "HTTP-Response-Metadata"]["HTML-Metadata"]["Head"]


def test_record_bytes_roundtrip_pure():
    rec = wat_record_bytes(
        "https://x.test/p", "2024-01-01T00:00:00Z", "Title 中文",
        ["https://x.test/a", "https://x.test/b"],
    )
    (row,) = wat_file_to_rows(rec)
    assert row[0] == "https://x.test/p"
    assert row[1].isoformat() == "2024-01-01T00:00:00+00:00"
    assert row[2] == "Title 中文"
    assert row[3] == ["https://x.test/a", "https://x.test/b"]
    # Content-Length counts utf-8 BYTES of the JSON body
    body = rec.split(b"\r\n\r\n", 1)[1].rsplit(b"\r\n\r\n", 1)[0]
    assert f"Content-Length: {len(body)}".encode() in rec


def test_lenient_on_malformed_envelope():
    rec = wat_record_bytes("https://x.test", "2024-01-01T00:00:00Z", "T", [])
    head, _body = rec.split(b"\r\n\r\n", 1)
    garbage = b"not json at all"
    head = head.replace(
        f"Content-Length: {len(_body) - 4}".encode(),
        f"Content-Length: {len(garbage)}".encode(),
    )
    (row,) = wat_file_to_rows(head + b"\r\n\r\n" + garbage + b"\r\n\r\n")
    assert row[0] == "https://x.test"
    assert row[2] is None and row[3] == []


def test_write_read_roundtrip(spark, pages, tmp_path):
    out = str(tmp_path / "wat")
    manifest = write_wat(pages, out, shards=2)
    assert sum(n for _, n in manifest) == len(ROWS)
    back = read_wat(spark, out + "/part-*").collect()
    got = sorted(
        (r["url"], r["title"], tuple(r["links"])) for r in back
    )
    assert got == sorted((u, t, tuple(ls)) for u, _, t, ls in ROWS)
    ts = {r["url"]: r["wat_ts"] for r in back}
    assert ts["https://a.test/2"].strftime("%H:%M:%S") == "00:00:37"


def test_plain_and_gzip_variants(spark, pages, tmp_path):
    out_gz = str(tmp_path / "gz")
    out_plain = str(tmp_path / "plain")
    write_wat(pages, out_gz, shards=1, gzip_output=True)
    write_wat(pages, out_plain, shards=1, gzip_output=False)
    (gz_file,) = glob.glob(out_gz + "/*")
    (plain_file,) = glob.glob(out_plain + "/*")
    assert gz_file.endswith(".warc.wat.gz")
    with open(gz_file, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"
    a = sorted(map(repr, read_wat(spark, gz_file).collect()))
    b = sorted(map(repr, read_wat(spark, plain_file).collect()))
    assert a == b


def test_publish_is_deterministic_and_overwrites(spark, pages, tmp_path):
    out = str(tmp_path / "det")
    write_wat(pages, out, shards=2)
    first = {
        os.path.basename(p): open(p, "rb").read()
        for p in glob.glob(out + "/*")
    }
    write_wat(pages, out, shards=1)
    assert len(glob.glob(out + "/*")) == 1
    write_wat(pages, out, shards=2)
    second = {
        os.path.basename(p): open(p, "rb").read()
        for p in glob.glob(out + "/*")
    }
    assert first == second


def test_warcinfo_skipped_and_truncation_tolerated(spark, pages, tmp_path):
    out = str(tmp_path / "trunc")
    write_wat(pages, out, shards=1, gzip_output=False)
    (path,) = glob.glob(out + "/*")
    blob = open(path, "rb").read()
    n_full = len(list(wat_file_to_rows(blob)))
    assert n_full == len(ROWS)
    rows = list(wat_file_to_rows(blob[: len(blob) - 10]))
    assert len(rows) == n_full - 1
