"""WAT (web archive transformation / metadata) sink + source — the
fourth Common Crawl artifact this engine speaks, completing the
family: WARC raw archives (sources/warc.py), WET extracted text
(sources/wet.py), CDX(J) capture indexes (sources/cdx.py), and WAT
metadata records — the per-capture JSON envelope (headers, HTML head
metadata, out-links) that link-graph and anchor-text pipelines
consume instead of re-parsing 100 TB of HTML.

A WAT file is a WARC file whose records are ``WARC-Type: metadata``
with an ``application/json`` body. The envelope here is the
Common-Crawl shape (Envelope → WARC-Header-Metadata /
Payload-Metadata → HTTP-Response-Metadata → HTML-Metadata →
Head.Title + Links[{path,url}]), emitted with sorted keys and
compact separators so record bytes are a pure function of the row —
the round-trip gate relies on that determinism. The record grammar
is shared with the WARC/WET readers (`iter_warc_records`): one
parser, three record types.

Scale shape (same as write_wet / write_cdxj):
* ``write_wat`` range-partitions by url and each task writes exactly
  ONE shard file (mapInPandas manifest pattern) — no driver
  materialization, no global sort, shard count scales with the
  corpus; shard key ranges never overlap.
* ``read_wat`` parallelizes by file (binaryFile — gzip members are
  not splittable), one task per shard.

Reference scope note: the reference engine stores links/title as
sqlite rows (crawler/models.py:Page.links/title); WAT is the
interchange form of exactly that metadata at Common-Crawl scale.
"""

from __future__ import annotations

import json
from typing import Iterator, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from website_indexer_spark.sources.warc import (
    _parse_warc_date,
    _strip_uri,
    iter_warc_records,
)
from website_indexer_spark.sources.wet import _gzip_member

_WAT_SCHEMA = (
    "url string, wat_ts timestamp, title string, links array<string>"
)

_WARCINFO = (
    b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
    b"Content-Type: application/warc-fields\r\nContent-Length: 24\r\n"
    b"\r\nformat: WAT metadata\r\n\r\n"
)


def wat_envelope(
    url: str, date_str: str, title: Optional[str], links: List[str]
) -> str:
    """The CC-style JSON envelope for one capture, rendered
    deterministically (sorted keys, compact separators)."""
    head = {}
    if title is not None:
        head["Title"] = title
    return json.dumps(
        {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Date": date_str,
                    "WARC-Target-URI": url,
                    "WARC-Type": "response",
                },
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Head": head,
                            "Links": [
                                {"path": "A@/href", "url": u} for u in links
                            ],
                        }
                    }
                },
            }
        },
        sort_keys=True,
        separators=(",", ":"),
    )


def wat_record_bytes(
    url: str, date_str: str, title: Optional[str], links: List[str]
) -> bytes:
    """One metadata record, WARC/1.0 framing, JSON body."""
    body = wat_envelope(url, date_str, title, links).encode("utf-8")
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {date_str}\r\n".encode()
        + b"Content-Type: application/json\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
    )
    return head + b"\r\n" + body + b"\r\n\r\n"


def write_wat(
    pages: DataFrame,
    out_dir: str,
    shards: int = 8,
    gzip_output: bool = True,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    title_col: str = "title",
    links_col: str = "links",
) -> list:
    """Publish (url, ts, title, links array<string>) rows as WAT
    shards under ``out_dir``. Same contract as write_wet: range-
    partitioned by url, sorted within shards, one file per task,
    driver collects only the (path, n_records) manifest."""
    import os
    import shutil

    import pandas as pd

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ext = "warc.wat.gz" if gzip_output else "warc.wat"

    rows = pages.select(
        F.col(url_col).alias("url"),
        F.date_format(
            F.col(ts_col).cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("date_str"),
        F.col(title_col).alias("title"),
        F.col(links_col).alias("links"),
    )

    def task(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        records = [_WARCINFO]
        n = 0
        for pdf in batches:
            for url, date_str, title, links in zip(
                pdf["url"], pdf["date_str"], pdf["title"], pdf["links"]
            ):
                records.append(
                    wat_record_bytes(
                        url,
                        date_str,
                        None if title is None else str(title),
                        [] if links is None else [str(u) for u in links],
                    )
                )
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


def wat_file_to_rows(blob: bytes) -> Iterator[tuple]:
    """One WAT file's metadata records as (url, wat_ts, title,
    links). Lenient on the envelope: missing layers yield None title
    / empty links rather than raising (a 100 TB read cannot die on
    one malformed record)."""
    for headers, body in iter_warc_records(blob):
        if headers.get("warc-type") != "metadata":
            continue
        uri = headers.get("warc-target-uri")
        if not uri:
            continue
        title: Optional[str] = None
        links: List[str] = []
        try:
            env = json.loads(body.decode("utf-8", errors="replace"))
            meta = (
                env.get("Envelope", {})
                .get("Payload-Metadata", {})
                .get("HTTP-Response-Metadata", {})
                .get("HTML-Metadata", {})
            )
            t = meta.get("Head", {}).get("Title")
            title = None if t is None else str(t)
            links = [
                str(d["url"])
                for d in meta.get("Links", [])
                if isinstance(d, dict) and "url" in d
            ]
        except (ValueError, AttributeError, TypeError):
            pass
        yield (
            _strip_uri(uri),
            _parse_warc_date(headers.get("warc-date")),
            title,
            links,
        )


def read_wat(spark: SparkSession, path_glob: str) -> DataFrame:
    """WAT shards → (url, wat_ts, title, links). One task per file."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            for blob in pdf["content"]:
                rows = list(wat_file_to_rows(bytes(blob)))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["url", "wat_ts", "title", "links"]
                    )

    return files.select("content").mapInPandas(parse, _WAT_SCHEMA)


__all__ = [
    "wat_envelope",
    "wat_record_bytes",
    "write_wat",
    "wat_file_to_rows",
    "read_wat",
]
