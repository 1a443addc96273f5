"""WARC ingestion: multi-member gzip parse, http-header strip, Spark
read path feeding the extraction kernel end-to-end."""

from __future__ import annotations

from ocr_pipeline_spark.operators.extraction import extract_pages
from ocr_pipeline_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc_bytes,
)

RECORDS = [
    (
        "https://a.example/1",
        "2024-03-01T12:00:00Z",
        b"<html><body><p>first page content paragraph</p></body></html>",
    ),
    (
        "https://b.example/2",
        "2024-03-02T08:30:00Z",
        b"<html><body><p>second page body text</p></body></html>",
    ),
    ("https://c.example/3", "2024-03-03T00:00:00Z", b"%PDF-1.4 not html"),
]


def test_parse_roundtrip():
    blob = write_warc_bytes(RECORDS)
    recs = list(parse_warc_bytes(blob))
    assert [r["url"] for r in recs] == [u for u, _, _ in RECORDS]
    assert recs[0]["payload"] == RECORDS[0][2]  # http headers stripped
    assert recs[0]["warc_ts"].year == 2024 and recs[0]["warc_ts"].month == 3


def test_non_response_records_skipped():
    blob = write_warc_bytes(RECORDS[:1])
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nsoft\r\n\r\n"
    )
    recs = list(parse_warc_bytes(info + gzip_decompress_recompress(blob)))
    assert len(recs) == 1


def gzip_decompress_recompress(blob: bytes) -> bytes:
    import gzip

    return gzip.decompress(blob)


def test_spark_read_and_extract(spark, tmp_path):
    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(write_warc_bytes(RECORDS))
    pages = read_warc(spark, str(p))
    assert pages.count() == 3
    assert set(pages.columns) == {"url", "warc_ts", "html", "text", "lang"}
    out = {r["url"]: r for r in extract_pages(pages).collect()}
    assert "first page content paragraph" in out["https://a.example/1"]["text"]
    assert out["https://c.example/3"]["kind"] == "pdf"


def test_non_200_responses_skipped():
    recs = [
        ("https://a.example/ok", "2024-03-01T12:00:00Z", b"<p>kept page</p>"),
    ]
    blob = write_warc_bytes(recs)
    import gzip

    raw = gzip.decompress(blob)
    # splice in a 404 response record
    notfound = raw.replace(b"HTTP/1.1 200 OK", b"HTTP/1.1 404 Not Found").replace(
        b"/ok", b"/nf"
    )
    out = list(parse_warc_bytes(raw + notfound))
    assert [r["url"] for r in out] == ["https://a.example/ok"]


def test_truncated_header_stops_gracefully():
    import gzip

    blob = gzip.decompress(write_warc_bytes(RECORDS[:1]))
    truncated = blob + b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target"
    recs = list(parse_warc_bytes(truncated))
    assert len(recs) == 1  # complete record parsed, truncated tail dropped
