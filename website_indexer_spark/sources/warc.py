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


# --------------------------------------------------------------------
# Deterministic synthetic-WARC builder (the warc_ingest oracle gate's
# fixture generator: VERDICT r3 next #7). Pure bytes-from-rows — no
# randomness, no clock (gzip mtime pinned to 0) — so the driver's
# DuckDB oracle can reconstruct the expected decoded table from the
# same source rows and hash-compare it against read_warc's output.
# --------------------------------------------------------------------

_WARC_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def synth_warc_plan(doc_id: int) -> dict:
    """The deterministic per-doc choices the synthesizer AND the SQL
    oracle must agree on (every branch keyed on doc_id arithmetic so
    both sides derive it independently):
    status 301 every 10th doc (no body/content-type, Location header);
    body transfer: chunked / gzip / identity cycling on doc_id % 3;
    WARC 1.1 fractional date every 5th doc (same instant)."""
    return {
        "url": f"https://w{doc_id % 7}.test/doc/{doc_id}",
        "redirect": doc_id % 10 == 0,
        "encoding": ("chunked", "gzip", "identity")[doc_id % 3],
        "frac_date": doc_id % 5 == 0,
        "epoch_off": int(doc_id),
    }


def _synth_html(doc_id: int, text: str) -> bytes:
    return (
        f"<html><head><title>doc {doc_id}</title></head>"
        f"<body>{text}</body></html>"
    ).encode("utf-8")


def _chunk(body: bytes, size: int = 100) -> bytes:
    out = []
    for i in range(0, len(body), size):
        piece = body[i : i + size]
        out.append(f"{len(piece):x}".encode() + b"\r\n" + piece + b"\r\n")
    out.append(b"0\r\n\r\n")
    return b"".join(out)


def _synth_record(doc_id: int, text: str) -> bytes:
    import email.utils

    plan = synth_warc_plan(doc_id)
    ts = _WARC_EPOCH.timestamp() + plan["epoch_off"]
    dt = datetime.fromtimestamp(ts, tz=timezone.utc)
    date = dt.strftime(
        "%Y-%m-%dT%H:%M:%S.%fZ" if plan["frac_date"] else "%Y-%m-%dT%H:%M:%SZ"
    )
    if plan["redirect"]:
        http = (
            b"HTTP/1.1 301 Moved Permanently\r\nLocation: "
            + f"{plan['url']}/moved".encode()
            + b"\r\n\r\n"
        )
    else:
        body = _synth_html(doc_id, text)
        if plan["encoding"] == "chunked":
            wire = _chunk(body)
            enc_hdr = b"Transfer-Encoding: chunked\r\n"
        elif plan["encoding"] == "gzip":
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(body)
            wire = buf.getvalue()
            enc_hdr = b"Content-Encoding: gzip\r\n"
        else:
            wire, enc_hdr = body, b""
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + enc_hdr
            + f"Content-Length: {len(wire)}".encode()
            + b"\r\n\r\n"
            + wire
        )
    warc_headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Target-URI: <{plan['url']}>\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + f"Content-Length: {len(http)}\r\n".encode()
        + b"Content-Type: application/http;msgtype=response\r\n"
    )
    return warc_headers + b"\r\n" + http + b"\r\n\r\n"


def synthesize_warc_files(
    doc_rows, out_dir: str, n_files: int = 4
) -> list:
    """Deterministically shard (doc_id, text) rows into ``n_files``
    archives under ``out_dir`` (doc_id % n_files picks the archive; even
    shards gzip multi-member, odd shards plain) with a non-response
    warcinfo record leading each archive (must be skipped by the
    reader). Returns the written paths."""
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    shards: dict = {i: [] for i in range(n_files)}
    for doc_id, text in doc_rows:
        shards[int(doc_id) % n_files].append((int(doc_id), text))
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n"
        b"\r\nsynthetic\r\n\r\n"
    )
    paths = []
    for i, rows in shards.items():
        records = [info] + [_synth_record(d, t) for d, t in sorted(rows)]
        if i % 2 == 0:
            members = []
            for rec in records:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                members.append(buf.getvalue())
            blob = b"".join(members)
            path = _os.path.join(out_dir, f"synth-{i}.warc.gz")
        else:
            blob = b"".join(records)
            path = _os.path.join(out_dir, f"synth-{i}.warc")
        with open(path, "wb") as f:
            f.write(blob)
        paths.append(path)
    return paths


__all__ = [
    "iter_warc_records",
    "parse_http_response",
    "warc_file_to_rows",
    "read_warc",
    "synth_warc_plan",
    "synthesize_warc_files",
]
