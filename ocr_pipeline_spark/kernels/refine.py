"""Sentence-span refinement — the web analogue of K5 (getPoly_core,
/root/reference/std-detection/craft_utils.py:81-225).

The reference's polygon pass tightens an accepted rectangular region
into finer geometry; the web analogue tightens an accepted content
block's span into per-sentence sub-spans. Like the reference (which
ships getPoly but runs with ``poly=False``, std-detection/api.py:87),
this is an OPTIONAL post-pass: the extraction pipeline is complete
without it.

Pure Python, Spark-free (kernel-is-spec): the Spark operator
(operators/extraction.refine_sentence_spans) and the DuckDB-oracle
builder both call this exact function.

Offsets are relative to the block's collapsed text (``Block.text``) —
block text is whitespace-collapsed and entity-unescaped, so sub-spans
cannot be mapped back to source offsets; the block's own
[span_start, span_end) already anchors it in the source document.
"""

from __future__ import annotations

import re

__all__ = ["refine_sentences"]

# A sentence: the shortest chunk ending in a [.!?]+ run followed by
# whitespace or end-of-text; a trailing fragment with no such terminator
# is its own span. Ordered alternation: the fragment alternative only
# fires where no terminated sentence can start, so spans cover every
# character (the refinement invariant — getPoly never loses pixels).
_SENT_RE = re.compile(r".*?[.!?]+(?:\s+|$)|.+", re.S)


def refine_sentences(text: str) -> list[tuple[int, int]]:
    """Sentence sub-spans [(start, end), ...) over a block's collapsed
    text. Deterministic; spans are non-overlapping, in order, trimmed of
    surrounding whitespace, and cover every non-space character:
    ``text[s:e]`` is the exact sentence slice."""
    spans: list[tuple[int, int]] = []
    for m in _SENT_RE.finditer(text):
        s, e = m.start(), m.end()
        while e > s and text[e - 1].isspace():
            e -= 1
        while s < e and text[s].isspace():
            s += 1
        if e > s:
            spans.append((s, e))
    return spans
