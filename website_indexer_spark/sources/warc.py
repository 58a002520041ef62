"""WARC ingestion: Common Crawl's native archive format → the engine's
``web_pages`` input table (the input_hint shape the crawl consumes).

The north-star input is "an Iceberg table of Common-Crawl-style web
pages"; this source closes the loop from the REAL Common-Crawl
artifact — WARC files (ISO 28500: concatenated records, each a header
block + Content-Length body; response records carry a raw HTTP/1.x
message) — to that table. Stdlib-only (gzip + byte scanning), no warc
library.

Scale design: a WARC file is the natural unit of parallelism (Common
Crawl ships ~10^5 ~1 GB .warc.gz files per snapshot). ``binaryFile``
hands each executor whole files — gzip members are not splittable —
so one task parses one archive and emits its response records;
parallelism = file count, the same layout every CC processing stack
uses. Memory per task is one decompressed archive (CC caps segments
~1 GB compressed); parsing is a linear scan. The parsed table is then
written once to parquet/Iceberg and all downstream crawls/queries scan
THAT, so the non-splittable read is paid once per snapshot.

Parser is exposed as pure functions (`iter_warc_records`,
`parse_http_response`) so tests drive them directly against the
reference's own committed archive (/root/reference/sample/crawl.warc.gz,
written by wget) without Spark.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

GZIP_MAGIC = b"\x1f\x8b"


def _decompress(blob: bytes) -> bytes:
    """Multi-member gzip (the standard WARC layout: one member per
    record) or plain bytes."""
    if blob[:2] == GZIP_MAGIC:
        return gzip.decompress(blob)  # handles concatenated members
    return blob


def iter_warc_records(blob: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Yield (warc_headers_lowercased, body_bytes) per record. Tolerant
    of trailing separators and case-insensitive header names; malformed
    tails stop iteration rather than raising (a truncated archive
    yields its complete prefix — at CC scale truncated members exist)."""
    data = _decompress(blob)
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers: dict = {}
        lines = data[start:hdr_end].split(b"\r\n")
        for line in lines[1:]:
            key, sep, val = line.partition(b":")
            if sep:
                headers[key.strip().lower().decode("latin-1")] = (
                    val.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + length > n:
            break  # truncated record
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def _dechunk(body: bytes) -> Optional[bytes]:
    """Decode a Transfer-Encoding: chunked message body (RFC 9112 §7.1:
    hex-size CRLF data CRLF ..., terminated by a 0-size chunk; chunk
    extensions after ';' ignored, trailers dropped). Returns None on
    framing errors — the caller drops the record rather than ship
    chunk-size framing into web_pages.html (ADVICE r3)."""
    out = []
    pos = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return None
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None
        pos = eol + 2
        if size == 0:
            return b"".join(out)  # trailers (if any) ignored
        if pos + size > n:
            return None  # truncated chunk
        out.append(body[pos : pos + size])
        pos += size
        if body[pos : pos + 2] != b"\r\n":
            return None
        pos += 2


def parse_http_response(payload: bytes):
    """Raw HTTP/1.x response message → (status_code, headers_lower,
    body). Returns None for non-HTTP payloads.

    WARC response records store the bytes as sent on the wire, so the
    body may still carry Transfer-Encoding: chunked framing and/or
    Content-Encoding: gzip compression (wget/wpull archive raw
    responses) — both are decoded here; a body whose declared framing
    cannot be decoded returns None rather than flowing corrupt bytes
    into extraction (ADVICE r3)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        head, body = payload, b""
    else:
        head, body = payload[:sep], payload[sep + 4 :]
    lines = head.split(b"\r\n")
    status_line = lines[0].split(None, 2)
    if len(status_line) < 2 or not status_line[0].startswith(b"HTTP/"):
        return None
    try:
        status = int(status_line[1])
    except ValueError:
        return None
    headers: dict = {}
    for line in lines[1:]:
        key, sep2, val = line.partition(b":")
        if sep2:
            headers[key.strip().lower().decode("latin-1")] = (
                val.strip().decode("latin-1")
            )
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
        if body is None:
            return None
    cenc = headers.get("content-encoding", "").lower().strip()
    if cenc in ("gzip", "x-gzip"):
        try:
            body = gzip.decompress(body)
        except (OSError, EOFError):
            return None
    elif cenc == "deflate":
        import zlib

        try:  # RFC 1950 zlib wrapper, with the raw-deflate fallback
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, -zlib.MAX_WBITS)
            except zlib.error:
                return None
    return status, headers, body


def _strip_uri(uri: str) -> str:
    # wget writes <uri>; the angle brackets are WARC 1.0 syntax
    return uri[1:-1] if uri.startswith("<") and uri.endswith(">") else uri


def _parse_warc_date(val: Optional[str]):
    if not val:
        return None
    # WARC 1.0 writes second precision; WARC 1.1 (ISO 28500:2017)
    # allows fractional seconds — accept both (ADVICE r3)
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return datetime.strptime(val, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    return None


def warc_file_to_rows(blob: bytes) -> Iterator[tuple]:
    """One archive's response records as web_pages rows:
    (url, warc_ts, html, text, lang, status_code, location,
    content_type). text/lang are NULL — they are extraction OUTPUTS."""
    for headers, body in iter_warc_records(blob):
        if headers.get("warc-type") != "response":
            continue
        uri = headers.get("warc-target-uri")
        if not uri:
            continue
        parsed = parse_http_response(body)
        if parsed is None:
            continue
        status, http_headers, http_body = parsed
        ctype = http_headers.get("content-type", "")
        ctype = ctype.split(";")[0].strip() or None
        yield (
            _strip_uri(uri),
            _parse_warc_date(headers.get("warc-date")),
            bytes(http_body) if status < 300 else None,
            None,
            None,
            status,
            http_headers.get("location"),
            ctype,
        )


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC archives → a web_pages DataFrame (WEB_PAGES_SCHEMA). One
    task per archive (binaryFile rows are whole files); write the
    result to parquet/Iceberg once per snapshot and crawl against
    that."""
    import pandas as pd

    from website_indexer_spark.sources.tables import WEB_PAGES_SCHEMA

    files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        cols = [f.name for f in WEB_PAGES_SCHEMA.fields]
        for pdf in batches:
            for blob in pdf["content"]:
                rows = list(warc_file_to_rows(bytes(blob)))
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.select("content").mapInPandas(parse, WEB_PAGES_SCHEMA)


__all__ = [
    "iter_warc_records",
    "parse_http_response",
    "warc_file_to_rows",
    "read_warc",
]
