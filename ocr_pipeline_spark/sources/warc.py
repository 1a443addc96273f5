"""WARC ingestion: Common-Crawl's native archive format → the pages table.

The pages-table schema (url, warc_ts, html, text, lang) is what Common
Crawl ships as WARC (ISO 28500): concatenated records, each an http-style
header block + payload, the whole file usually a multi-member gzip (one
member per record, so members are individually seekable).

Spark packaging: ``spark.read.format("binaryFile")`` lists and reads the
archive files (one row per file — WARC files are sized ~1 GiB exactly so
that file-level parallelism is the right grain), then ``mapInPandas``
parses records out of each payload. Parsing is pure Python over bytes —
per-record, not per-row-of-a-DataFrame, so the no-per-row-Python rule is
kept at the page level: one Arrow batch of files in, one batch of pages
out.

Only ``response`` records with an http 200 payload become pages; the
http header block is stripped; charset stays undecided (the extraction
kernel decodes — decode-once lives THERE, SURVEY.md §2.1 S3).

This is a from-scratch minimal reader (headers + length-delimited
payloads + multi-member gzip), not a warcio port; enough for Common-
Crawl-shaped archives and fully deterministic.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["parse_warc_bytes", "read_warc", "write_warc_bytes"]

_CRLF = b"\r\n"


def _parse_headers(block: bytes) -> dict[bytes, bytes]:
    headers: dict[bytes, bytes] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Yield dicts (url, warc_ts, payload) for each response record.

    Accepts plain or (multi-member) gzip WARC bytes."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # multi-member: module handles all
    pos = 0
    n = len(data)
    while pos < n:
        # skip record separators
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if data[pos : pos + 5] != b"WARC/":
            break  # malformed tail: stop rather than misparse
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            break  # truncated record header (cut-off download): stop
        headers = _parse_headers(data[pos:hdr_end])
        length = int(headers.get(b"content-length", b"0"))
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts_raw = headers.get(b"warc-date", b"").decode("ascii", "replace")
        try:
            ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00")).astimezone(
                timezone.utc
            ).replace(tzinfo=None)
        except ValueError:
            ts = None
        # strip the http header block if the payload carries one; only
        # 2xx responses become pages (404/5xx/redirect bodies are not
        # corpus text)
        if body[:5] == b"HTTP/":
            parts = body.split(_CRLF, 1)[0].split()
            if len(parts) < 2 or parts[1][:1] != b"2":
                continue
            if _CRLF + _CRLF in body:
                body = body.split(_CRLF + _CRLF, 1)[1]
        yield {"url": url, "warc_ts": ts, "payload": body}


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) at ``path`` (glob ok) → pages DataFrame
    (url, warc_ts, html binary, text, lang) — text/lang null, to be
    filled by extraction / lang-ID downstream."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc_bytes(bytes(content)):
                    rows.append(
                        (rec["url"], rec["warc_ts"], rec["payload"], None, None)
                    )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "html", "text", "lang"]
                )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(
        fn,
        schema="url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    )


def write_warc_bytes(records: list[tuple[str, str, bytes]]) -> bytes:
    """Build a gzip multi-member WARC from (url, iso_ts, payload) — the
    test/fixture writer (each record its own gzip member, like Common
    Crawl)."""
    out = io.BytesIO()
    for url, ts, payload in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {ts}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
        )
        member = gzip.compress(hdr + http + _CRLF + _CRLF)
        out.write(member)
    return out.getvalue()
