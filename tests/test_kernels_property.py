"""Property-based kernel tests (hypothesis): the byte-identity contract
must hold for arbitrary inputs, not just fixtures.

Invariants fuzzed:
- extract_document is total (never raises) and deterministic on any bytes;
- spans index into the decoded document and slice back to the block text;
- materialized text is exactly the kept blocks joined by the separator;
- block order is source order (O1).
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_pipeline_spark.kernels.extract import extract_document
from ocr_pipeline_spark.kernels.htmlkit import decode_payload, segment_html
from ocr_pipeline_spark.kernels.materialize import materialize_text

# -- strategies -------------------------------------------------------------

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)
_word = st.text(alphabet="abcdefghijklmnop ", min_size=1, max_size=30)


@st.composite
def html_doc(draw):
    """Random nested-ish HTML from paragraph/link/div fragments."""
    parts = []
    for _ in range(draw(st.integers(0, 8))):
        kind = draw(st.sampled_from(["p", "a", "div", "raw", "script"]))
        body = draw(_word)
        if kind == "p":
            parts.append(f"<p>{body}</p>")
        elif kind == "a":
            parts.append(f'<p>{body} <a href="/x">{draw(_word)}</a></p>')
        elif kind == "div":
            parts.append(f"<div><p>{body}</p><p>{draw(_word)}</p></div>")
        elif kind == "script":
            parts.append(f"<script>var x = '<p>{body}</p>';</script>")
        else:
            parts.append(body)
    return "<html><body>" + "".join(parts) + "</body></html>"


# -- totality + determinism on arbitrary bytes ------------------------------


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_total_and_deterministic_on_arbitrary_bytes(payload):
    a = extract_document(payload)
    b = extract_document(payload)
    assert a.text == b.text and a.text_sha256 == b.text_sha256
    assert a.error == b.error and a.kind == b.kind
    assert isinstance(a.text, str) and len(a.text_sha256) == 64


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=5, max_size=300))
def test_pdf_magic_never_raises(payload):
    r = extract_document(b"%PDF-" + payload)
    assert r.kind == "pdf" or r.error is not None


# -- span + materialization invariants on generated HTML --------------------


@settings(max_examples=150, deadline=None)
@given(html_doc())
def test_spans_slice_back_to_block_text(doc):
    blocks = segment_html(doc)
    for b in blocks:
        assert 0 <= b.span_start <= b.span_end <= len(doc)
        # the span covers the raw source (inline markup included) whose
        # tag-stripped, collapsed text is the block text
        raw = doc[b.span_start : b.span_end]
        stripped = " ".join(re.sub(r"<[^>]*>", " ", raw).split())
        assert stripped == b.text


@settings(max_examples=150, deadline=None)
@given(html_doc())
def test_block_order_and_materialization(doc):
    r = extract_document(doc.encode())
    assert r.error is None
    idxs = [b.block_idx for b in r.blocks]
    assert idxs == sorted(idxs) == list(range(len(r.blocks)))
    starts = [b.span_start for b in r.blocks]
    assert starts == sorted(starts)
    kept = [b.text for b, f in zip(r.blocks, r.flags) if f]
    assert r.text == materialize_text(r.blocks, r.flags)
    for t in kept:
        assert t in r.text


@settings(max_examples=100, deadline=None)
@given(html_doc(), st.sampled_from(["utf-8", "iso-8859-1", "utf-16"]))
def test_decode_payload_charset_roundtrip(doc, charset):
    payload = doc.encode(charset, errors="replace")
    decoded, detected = decode_payload(payload)
    assert isinstance(decoded, str)
    blocks = segment_html(decoded)
    for b in blocks:
        assert decoded[b.span_start : b.span_end] is not None


# --- BPE kernel properties (kernels/bpe.py) -------------------------------

_words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
    min_size=0,
    max_size=12,
)
_texts = st.lists(_words, min_size=0, max_size=20).map(" ".join)


@given(_texts, st.integers(min_value=0, max_value=12))
@settings(max_examples=60, deadline=None)
def test_bpe_encode_concatenation_preserves_text(text, n_merges):
    from ocr_pipeline_spark.kernels.bpe import (
        encode_text,
        norm_words,
        train_merges,
        word_frequencies,
    )

    merges = train_merges(word_frequencies([text]), n_merges)
    toks = encode_text(text, merges)
    # lossless: concatenating the subword tokens restores the
    # whitespace-normalized text with separators removed
    assert "".join(toks) == "".join(w for w in norm_words(text))
    # deterministic
    assert toks == encode_text(text, merges)


@given(st.lists(_words, min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_bpe_apply_merge_never_lengthens(syms):
    from ocr_pipeline_spark.kernels.bpe import apply_merge

    out = apply_merge(syms, syms[0], syms[-1])
    assert len(out) <= len(syms)
    assert "".join(out) == "".join(syms)
