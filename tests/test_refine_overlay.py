"""K5/K14 analogues: sentence-span refinement + debug overlay (kernel
properties here; cross-engine value parity in test_entry.py)."""

from __future__ import annotations

import html as _html

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_pipeline_spark.kernels.extract import extract_document
from ocr_pipeline_spark.kernels.htmlkit import decode_payload
from ocr_pipeline_spark.kernels.overlay import render_overlay
from ocr_pipeline_spark.kernels.refine import refine_sentences


def test_refine_basic_sentences():
    text = "First sentence. Second one! Third?? And a trailing fragment"
    spans = refine_sentences(text)
    assert [text[s:e] for s, e in spans] == [
        "First sentence.",
        "Second one!",
        "Third??",
        "And a trailing fragment",
    ]


def test_refine_empty_and_whitespace():
    assert refine_sentences("") == []
    assert refine_sentences("   ") == []
    assert refine_sentences("one") == [(0, 3)]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from("ab .!?"), max_size=60))
def test_refine_span_properties(text):
    spans = refine_sentences(text)
    prev_end = 0
    covered = set()
    for s, e in spans:
        assert 0 <= s < e <= len(text)
        assert s >= prev_end          # ordered, non-overlapping
        prev_end = e
        slice_ = text[s:e]
        assert slice_ == slice_.strip()  # trimmed
        covered.update(range(s, e))
    # every non-space char is inside exactly one span
    for i, ch in enumerate(text):
        if not ch.isspace():
            assert i in covered


@pytest.fixture(scope="module")
def html_result():
    payload = (
        b"<html><body><nav><a href='/a'>home</a> <a href='/b'>about</a>"
        b"</nav><p>Real content paragraph one. It has two sentences.</p>"
        b"<p>Another paragraph of real content follows here and it is "
        b"long enough to be kept by the classifier thresholds today.</p>"
        b"<footer><a href='/c'>legal</a></footer></body></html>"
    )
    r = extract_document(payload)
    doc, _ = decode_payload(payload)
    return doc, r


def test_overlay_marks_match_flags(html_result):
    doc, r = html_result
    out = render_overlay(doc, r.blocks, r.flags)
    assert out.count("<mark") == len(r.blocks)
    assert out.count("</mark>") == len(r.blocks)
    assert out.count('class="content"') == sum(r.flags)
    assert out.count('class="boiler"') == len(r.flags) - sum(r.flags)


def test_overlay_preserves_document_text(html_result):
    doc, r = html_result
    out = render_overlay(doc, r.blocks, r.flags)
    # stripping the overlay markup back out yields the escaped document
    body = out.split("<pre>", 1)[1].rsplit("</pre>", 1)[0]
    for b in r.blocks:
        body = body.replace("</mark>", "", 1)
    import re

    body = re.sub(r"<mark [^>]*>", "", body)
    body = body.replace("</mark>", "")
    assert _html.unescape(body) == doc


def test_overlay_spans_are_source_slices(html_result):
    doc, r = html_result
    out = render_overlay(doc, r.blocks, r.flags)
    for b in r.blocks:
        assert _html.escape(doc[b.span_start : b.span_end]) in out
