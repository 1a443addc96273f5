"""Unit tests for the PDF layout kernel (SURVEY.md §2.7 K15)."""

from __future__ import annotations

from ocr_pipeline_spark.kernels.extract import extract_document
from ocr_pipeline_spark.kernels.pdfkit import build_pdf, parse_pdf_blocks


def test_roundtrip_paragraph_blocks():
    paras = [
        ["First paragraph line one.", "First paragraph line two."],
        ["Second paragraph only line."],
    ]
    blocks = parse_pdf_blocks(build_pdf(paras))
    assert [b.text for b in blocks] == [
        "First paragraph line one. First paragraph line two.",
        "Second paragraph only line.",
    ]
    assert [b.block_idx for b in blocks] == [0, 1]


def test_spans_point_at_string_bodies():
    data = build_pdf([["Alpha beta."], ["Gamma delta."]])
    doc = data.decode("latin-1")
    for b in parse_pdf_blocks(data):
        assert b.text.split()[0] in doc[b.span_start : b.span_end]


def test_escaped_parens():
    blocks = parse_pdf_blocks(build_pdf([["Paren (test) and \\ backslash."]]))
    assert blocks[0].text == "Paren (test) and \\ backslash."


def test_reading_order_top_to_bottom():
    data = build_pdf([["Top."], ["Middle."], ["Bottom."]])
    assert [b.text for b in parse_pdf_blocks(data)] == ["Top.", "Middle.", "Bottom."]


def test_pdf_dispatch_and_garbage():
    r = extract_document(build_pdf([["Real pdf content line here."]]))
    assert r.kind == "pdf" and r.error is None
    assert "Real pdf content line here." in r.text

    bad = extract_document(b"%PDF-1.4\ngarbage\n%%EOF")
    assert bad.kind == "pdf" and bad.error is not None
