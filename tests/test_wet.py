"""WET sink/source (sources/wet.py): byte-level record framing,
deterministic publishing, and the Spark round trip."""

from __future__ import annotations

import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F

from website_indexer_spark.sources.wet import (
    read_wet,
    wet_file_to_rows,
    wet_record_bytes,
    write_wet,
)

ROWS = [
    ("https://a.test/1", "2024-01-01 00:00:00", "hello world"),
    ("https://a.test/2", "2024-01-01 00:00:37", "héllo ünïcode 中文"),
    ("https://b.test/3", "2024-02-03 04:05:06", ""),
    ("https://b.test/4", "2024-12-31 23:59:59", "line one\nline two"),
]


@pytest.fixture(scope="module")
def pages(spark):
    df = spark.createDataFrame(ROWS, ["url", "ts", "text"])
    return df.select(
        "url", F.col("ts").cast("timestamp").alias("warc_ts"), "text"
    )


def test_record_bytes_roundtrip_pure():
    rec = wet_record_bytes(
        "https://x.test/p", "2024-01-01T00:00:00Z", "body text"
    )
    rows = list(wet_file_to_rows(rec))
    assert rows == [
        ("https://x.test/p", rows[0][1], "body text")
    ]
    assert rows[0][1].isoformat() == "2024-01-01T00:00:00+00:00"


def test_utf8_length_is_bytes_not_chars():
    text = "中文" * 10  # 3 bytes per char in utf-8
    rec = wet_record_bytes("https://x.test", "2024-01-01T00:00:00Z", text)
    assert f"Content-Length: {len(text.encode('utf-8'))}".encode() in rec
    (row,) = wet_file_to_rows(rec)
    assert row[2] == text


def test_write_read_roundtrip(spark, pages, tmp_path):
    out = str(tmp_path / "wet")
    manifest = write_wet(pages, out, shards=2)
    assert sum(n for _, n in manifest) == len(ROWS)
    back = read_wet(spark, out + "/part-*").collect()
    got = sorted((r["url"], r["text"]) for r in back)
    assert got == sorted((u, t) for u, _, t in ROWS)
    # timestamps survive the round trip (UTC session)
    ts = {r["url"]: r["wet_ts"] for r in back}
    assert ts["https://a.test/2"].strftime("%H:%M:%S") == "00:00:37"


def test_plain_and_gzip_variants(spark, pages, tmp_path):
    out_gz = str(tmp_path / "gz")
    out_plain = str(tmp_path / "plain")
    write_wet(pages, out_gz, shards=1, gzip_output=True)
    write_wet(pages, out_plain, shards=1, gzip_output=False)
    (gz_file,) = glob.glob(out_gz + "/*")
    (plain_file,) = glob.glob(out_plain + "/*")
    assert gz_file.endswith(".warc.wet.gz")
    with open(gz_file, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"
    a = sorted(read_wet(spark, gz_file).collect())
    b = sorted(read_wet(spark, plain_file).collect())
    assert a == b


def test_publish_is_deterministic_and_overwrites(spark, pages, tmp_path):
    out = str(tmp_path / "det")
    write_wet(pages, out, shards=2)
    first = {
        os.path.basename(p): open(p, "rb").read()
        for p in glob.glob(out + "/*")
    }
    # second publish with fewer shards must leave no stale files
    write_wet(pages, out, shards=1)
    assert len(glob.glob(out + "/*")) == 1
    write_wet(pages, out, shards=2)
    second = {
        os.path.basename(p): open(p, "rb").read()
        for p in glob.glob(out + "/*")
    }
    assert first == second  # byte-identical republish


def test_warcinfo_skipped_and_truncation_tolerated(spark, pages, tmp_path):
    out = str(tmp_path / "trunc")
    write_wet(pages, out, shards=1, gzip_output=False)
    (path,) = glob.glob(out + "/*")
    blob = open(path, "rb").read()
    # leading warcinfo record is not a row
    n_full = len(list(wet_file_to_rows(blob)))
    assert n_full == len(ROWS)
    # chop mid-final-record: complete prefix still parses
    rows = list(wet_file_to_rows(blob[: len(blob) - 10]))
    assert len(rows) == n_full - 1
