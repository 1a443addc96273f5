"""Debug overlay renderer — the web analogue of K14 (the reference's
box-drawing debug images, /root/reference/pipeline/processors.py:148-175
and pipeline/pipeline_utils.py:15-56).

The reference painted detected bboxes onto the source image for visual
QA; the web analogue renders the decoded document with every block's
source span highlighted — green for content-classified blocks, red for
boilerplate — with densities in the tooltip. Dev-only surface: never in
a hot path (the operator wrapper says the same).

Pure Python, Spark-free (kernel-is-spec). HTML documents only: block
spans index the DECODED document string (htmlkit); PDF block spans
index payload bytes, which a text overlay cannot render faithfully.
"""

from __future__ import annotations

import html as _html

from .htmlkit import Block

__all__ = ["render_overlay"]

_STYLE = (
    "mark.content{background:#c8f0c8} mark.boiler{background:#f0c8c8} "
    "pre{white-space:pre-wrap;font-family:monospace}"
)


def render_overlay(doc: str, blocks: list[Block], flags: list[bool]) -> str:
    """Decoded document + blocks → standalone HTML report string.

    Every block's [span_start, span_end) source slice is wrapped in a
    <mark> (class ``content``/``boiler`` per its classification flag,
    densities + block_idx in the title attribute); all document text is
    HTML-escaped. Blocks are rendered in span order; overlapping spans
    are clipped to the previous block's end (the segmenter emits
    disjoint spans — clipping only defends the renderer)."""
    parts = [
        "<!doctype html><html><head><meta charset=\"utf-8\">",
        f"<style>{_STYLE}</style></head><body><pre>",
    ]
    pos = 0
    for b, keep in sorted(zip(blocks, flags), key=lambda p: p[0].span_start):
        start = max(b.span_start, pos)
        end = max(b.span_end, start)
        parts.append(_html.escape(doc[pos:start]))
        cls = "content" if keep else "boiler"
        title = (
            f"block {b.block_idx} td={b.text_density:.3f} "
            f"ld={b.link_density:.3f}"
        )
        parts.append(f'<mark class="{cls}" title="{title}">')
        parts.append(_html.escape(doc[start:end]))
        parts.append("</mark>")
        pos = end
    parts.append(_html.escape(doc[pos:]))
    parts.append("</pre></body></html>")
    return "".join(parts)
