"""Block classification: content vs boilerplate (pure Python).

Analogue of the reference's thresholding + recognition decision path:
- min-size filter        ≈ component area >= 10 (std-detection/craft_utils.py:36-37)
- link-density cutoff    ≈ link_threshold 0.4 + link-only removal
  (craft_utils.py:26-27,45; thresholds at std-detection/api.py:87)
- text-density cutoff    ≈ text score >= 0.7 peak rule (craft_utils.py:40)
- neighbor smoothing     ≈ the dilation step that merges nearby positives
  (craft_utils.py:43-47), here Boilerpipe's "short block between two content
  blocks is content" rule.

All thresholds are module constants so the golden fixtures pin them; bump
``ocr_pipeline_spark.EXTRACTOR_VERSION`` on any change.
"""

from __future__ import annotations

from .htmlkit import Block

__all__ = [
    "MIN_BLOCK_CHARS",
    "MAX_LINK_DENSITY",
    "MIN_TEXT_DENSITY",
    "LONG_BLOCK_CHARS",
    "DROP_ANCESTORS",
    "classify_blocks",
]

MIN_BLOCK_CHARS = 10        # craft_utils.py:36-37 (area >= 10)
MAX_LINK_DENSITY = 0.4      # api.py:87 link_threshold=0.4
MIN_TEXT_DENSITY = 8.0      # api.py:87 text_threshold=0.7 analogue
LONG_BLOCK_CHARS = 80       # long blocks are content regardless of density
DROP_ANCESTORS = frozenset({"nav", "aside", "footer", "header", "head"})
"""Semantic-HTML boilerplate containers (jusText/Boilerpipe-style markup
hint); 'head' also drops <title> text from the content stream."""


def _eligible(b: Block) -> bool:
    if b.n_chars < MIN_BLOCK_CHARS:
        return False
    if b.link_density > MAX_LINK_DENSITY:
        return False
    path = b.tag_path.split("/") if b.tag_path else []
    return not any(t in DROP_ANCESTORS for t in path)


def classify_blocks(blocks: list[Block]) -> list[bool]:
    """Return is_content flags, order-aligned with ``blocks``.

    Two deterministic passes:
    1. base:   eligible AND (text_density >= MIN_TEXT_DENSITY
                             OR n_chars >= LONG_BLOCK_CHARS)
    2. smooth: an eligible non-base block whose previous and next *base*
       flags are both content is promoted (neighbors read base flags, not
       updated ones, so the result is independent of scan direction).
    """
    elig = [_eligible(b) for b in blocks]
    base = [
        e and (b.text_density >= MIN_TEXT_DENSITY or b.n_chars >= LONG_BLOCK_CHARS)
        for e, b in zip(elig, blocks)
    ]
    out = list(base)
    for i in range(len(blocks)):
        if not base[i] and elig[i]:
            prev_ok = i > 0 and base[i - 1]
            next_ok = i + 1 < len(blocks) and base[i + 1]
            if prev_ok and next_ok:
                out[i] = True
    return out
