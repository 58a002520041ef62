"""WET (WARC text-conversion) sink + source — the third leg of the
Common Crawl artifact trio this engine speaks: WARC archives
(sources/warc.py, the crawl's raw input), CDX(J) capture indexes
(sources/cdx.py, the lookup side), and WET extracted-text files —
the derived format every public web-text pipeline (C4, Gopher's
MassiveWeb, RefinedWeb, FineWeb) actually consumes.

A WET file is a WARC file whose records are ``WARC-Type: conversion``
with a ``text/plain`` body holding the page's extracted text; files
lead with a ``warcinfo`` record and are conventionally multi-member
gzip (one member per record, so readers can resync mid-file). The
record parser is shared with the WARC source (`iter_warc_records`) —
one grammar, two record types.

Scale shape, mirroring the WARC reader's design:
* ``write_wet`` range-partitions by url and writes ONE file per
  shard from inside the task (``mapInPandas`` manifest pattern) — no
  driver materialization, no global sort; shard count scales with
  the corpus exactly like write_cdxj's.
* ``read_wet`` parallelizes by file (binaryFile; gzip members are
  not splittable), one task per shard — the layout every CC
  processing stack uses.

Reference scope note: the reference engine has no WET notion (it
stores extracted text in sqlite rows — crawler/models.py); this is
the interchange-format surface a 100 TB deployment needs to consume
and publish the same corpora everyone else does.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from website_indexer_spark.sources.warc import (
    _parse_warc_date,
    _strip_uri,
    iter_warc_records,
)

_WET_SCHEMA = "url string, wet_ts timestamp, text string"

_WARCINFO = (
    b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
    b"Content-Type: application/warc-fields\r\nContent-Length: 23\r\n"
    b"\r\nformat: WET conversion\r\n\r\n"
)


def wet_record_bytes(url: str, date_str: str, text: str) -> bytes:
    """One conversion record, WARC/1.0 framing. ``date_str`` is the
    pre-rendered ISO instant (callers format it engine-side so the
    bytes are deterministic)."""
    body = (text or "").encode("utf-8")
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {date_str}\r\n".encode()
        + b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
    )
    return head + b"\r\n" + body + b"\r\n\r\n"


def _gzip_member(rec: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(rec)
    return buf.getvalue()


def write_wet(
    pages: DataFrame,
    out_dir: str,
    shards: int = 8,
    gzip_output: bool = True,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> list:
    """Publish (url, ts, text) rows as WET shards under ``out_dir``.

    Range-partitioned by url and sorted within shards, so shard
    contents are deterministic for a given input (the gate relies on
    it) and a shard's key range never overlaps another's. Each task
    writes exactly its own file — the driver only collects the
    manifest (path, record count) rows it returns.
    """
    import os
    import shutil

    import pandas as pd

    # overwrite semantics: a previous publish with more shards must
    # not leave stale files behind the new manifest
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ext = "warc.wet.gz" if gzip_output else "warc.wet"

    rows = pages.select(
        F.col(url_col).alias("url"),
        F.date_format(
            F.col(ts_col).cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("date_str"),
        F.col(text_col).alias("text"),
    )

    def task(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        records = [_WARCINFO]
        n = 0
        for pdf in batches:
            for url, date_str, text in zip(
                pdf["url"], pdf["date_str"], pdf["text"]
            ):
                records.append(wet_record_bytes(url, date_str, text))
                n += 1
        if n == 0:
            return
        if gzip_output:
            blob = b"".join(_gzip_member(r) for r in records)
        else:
            blob = b"".join(records)
        path = os.path.join(out_dir, f"part-{pid:05d}.{ext}")
        with open(path, "wb") as f:
            f.write(blob)
        yield pd.DataFrame({"path": [path], "n_records": [n]})

    manifest = (
        rows.repartitionByRange(shards, "url")
        .sortWithinPartitions("url")
        .mapInPandas(task, "path string, n_records long")
        .collect()
    )
    return [(r["path"], r["n_records"]) for r in manifest]


def wet_file_to_rows(blob: bytes) -> Iterator[tuple]:
    """One WET file's conversion records as (url, wet_ts, text)."""
    for headers, body in iter_warc_records(blob):
        if headers.get("warc-type") != "conversion":
            continue
        uri = headers.get("warc-target-uri")
        if not uri:
            continue
        yield (
            _strip_uri(uri),
            _parse_warc_date(headers.get("warc-date")),
            body.decode("utf-8", errors="replace"),
        )


def read_wet(spark: SparkSession, path_glob: str) -> DataFrame:
    """WET shards → (url, wet_ts, text). One task per file."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            for blob in pdf["content"]:
                rows = list(wet_file_to_rows(bytes(blob)))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["url", "wet_ts", "text"]
                    )

    return files.select("content").mapInPandas(parse, _WET_SCHEMA)


__all__ = ["wet_record_bytes", "write_wet", "wet_file_to_rows", "read_wet"]
