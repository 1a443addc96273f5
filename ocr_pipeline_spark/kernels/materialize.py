"""Deterministic text materialization (pure Python).

Analogue of the reference's decode + post-process fold:
- CTC/Attn decode fold (str-recognition/utils.py:60-79, 118-142): ordered
  symbols → final string with dedup rules. Here: ordered kept blocks →
  final text, block separator fixed at "\\n\\n", intra-block whitespace
  already collapsed by segmentation.
- post_process_text (str-recognition/processor.py:159-180): final strip.

This is the byte-identity contract surface: any change here changes every
golden SHA-256.
"""

from __future__ import annotations

import hashlib

from .htmlkit import Block

__all__ = ["BLOCK_SEPARATOR", "materialize_text", "sha256_text"]

BLOCK_SEPARATOR = "\n\n"


def materialize_text(blocks: list[Block], flags: list[bool]) -> str:
    """Join kept blocks in block_idx order (order invariant O1,
    str-recognition/processor.py:135-138: output order must match input)."""
    return BLOCK_SEPARATOR.join(
        b.text for b, keep in zip(blocks, flags) if keep
    ).strip()


def sha256_text(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
