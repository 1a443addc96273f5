"""HTML payload decoding + DOM block segmentation (pure Python, stdlib only).

Analogue of the reference's detection stage (std-detection/):

- ``decode_payload``   ≈ byte2image / resize_aspect_ratio
  (std-detection/file_utils.py:12-27, std-detection/imgproc.py:37-65):
  raw bytes → a normalized canvas we can address with offsets. Here the
  "canvas" is the decoded unicode document string, and span offsets index
  into it (the ``ratio`` analogue for coordinate unmapping).
- ``segment_html``     ≈ CRAFT forward + getDetBoxes_core
  (std-detection/craft.py:58-80, craft_utils.py:19-79): emit candidate
  blocks, each carrying the (text_density, link_density) score pair — the
  web-text analogue of CRAFT's per-pixel (text_score, link_score) maps
  (CETD / Boilerpipe block scoring).

Determinism contract: stdlib ``html.parser`` with ``convert_charrefs=False``
so every source position is exact; entity text comes from ``html.unescape``.
No regex backtracking surprises, no version-floating third-party parser.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass
from html.parser import HTMLParser

__all__ = ["Block", "decode_payload", "segment_html"]


@dataclass
class Block:
    """One candidate text block (analogue of SingleDetection,
    common/schema/detection.py:14-22 — bbox polygon → [span_start, span_end),
    confidence → (text_density, link_density))."""

    block_idx: int
    span_start: int  # char offset into the decoded document string
    span_end: int    # exclusive
    text: str        # whitespace-collapsed, entity-unescaped block text
    n_chars: int
    n_link_chars: int
    n_tags: int      # tags opened inside the block (density denominator)
    tag_path: str    # open-element path when the block's text began
    text_density: float
    link_density: float


# Elements whose start or end terminates the current block (block formation ≈
# the connected-component merge in craft_utils.py:28-34: adjacency here is
# "same block-level container").
_BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tr td th
    article section header footer nav aside main blockquote pre figure
    figcaption form fieldset address hr br title body html head option
    select textarea button label caption summary details""".split()
)

# Content inside these is never text (≈ masking non-text channels).
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})

# Void elements: never pushed on the open-element stack.
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?\s*([A-Za-z0-9_\-]+)", re.I)


def decode_payload(data: bytes) -> tuple[str, str]:
    """Decode HTML bytes to str. Returns (document, charset_used).

    Charset sniff: <meta charset=...> / content-type within the first 2048
    bytes, else utf-8. Undecodable byte sequences are replaced (deterministic
    U+FFFD) so offsets remain stable for any input.
    """
    charset = "utf-8"
    m = _CHARSET_RE.search(data[:2048])
    if m:
        cand = m.group(1).decode("ascii", "replace").strip().lower()
        try:
            b"x".decode(cand)
            charset = cand
        except (LookupError, UnicodeDecodeError):
            charset = "utf-8"
    return data.decode(charset, errors="replace"), charset


class _BlockParser(HTMLParser):
    """Streaming block segmenter with exact source offsets."""

    def __init__(self, doc: str) -> None:
        super().__init__(convert_charrefs=False)
        self._doc = doc
        # line -> absolute offset of its first char (HTMLParser positions
        # are (1-based line, 0-based col)).
        self._line_starts = [0]
        for i, ch in enumerate(doc):
            if ch == "\n":
                self._line_starts.append(i + 1)
        self.blocks: list[Block] = []
        self._stack: list[str] = []
        self._skip_depth = 0
        self._a_depth = 0
        self._parts: list[str] = []       # unescaped text parts of open block
        self._span_start: int | None = None
        self._span_end: int = 0
        self._link_chars = 0
        self._tags_in_block = 0
        self._path: str = ""

    # -- offset helpers ----------------------------------------------------
    def _offset(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    # -- block lifecycle ----------------------------------------------------
    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text and self._span_start is not None:
            n_chars = len(text)
            n_tags = self._tags_in_block
            self.blocks.append(
                Block(
                    block_idx=len(self.blocks),
                    span_start=self._span_start,
                    span_end=self._span_end,
                    text=text,
                    n_chars=n_chars,
                    n_link_chars=min(self._link_chars, n_chars),
                    n_tags=n_tags,
                    tag_path=self._path,
                    text_density=n_chars / (1.0 + n_tags),
                    link_density=min(self._link_chars, n_chars) / n_chars,
                )
            )
        self._parts = []
        self._span_start = None
        self._span_end = 0
        self._link_chars = 0
        self._tags_in_block = 0
        self._path = ""

    def _add_text(self, unescaped: str, raw_len: int) -> None:
        if self._skip_depth:
            return
        pos = self._offset()
        stripped = unescaped.strip()
        if stripped:
            if self._span_start is None:
                # offset of first non-ws char within the raw token: for data
                # tokens raw == unescaped; for entity tokens the token is
                # atomic and non-ws, so index 0 is exact either way.
                lead = (
                    len(unescaped) - len(unescaped.lstrip())
                    if raw_len == len(unescaped)
                    else 0
                )
                self._span_start = pos + lead
                self._path = "/".join(self._stack)
            trail = (
                len(unescaped) - len(unescaped.rstrip())
                if raw_len == len(unescaped)
                else 0
            )
            self._span_end = pos + raw_len - trail
            if self._a_depth:
                self._link_chars += len(" ".join(unescaped.split()))
        self._parts.append(unescaped)

    # -- parser callbacks ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            self._flush()
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._a_depth += 1
        if tag not in _VOID_TAGS:
            self._stack.append(tag)
        if self._span_start is not None:
            self._tags_in_block += 1

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()
        elif self._span_start is not None:
            self._tags_in_block += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in self._stack:  # defensive pop for malformed nesting
            while self._stack and self._stack[-1] != tag:
                self._stack.pop()
            if self._stack:
                self._stack.pop()

    def handle_data(self, data):
        if data:
            self._add_text(data, len(data))

    def handle_entityref(self, name):
        self._add_text(_html.unescape(f"&{name};"), len(name) + 2)

    def handle_charref(self, name):
        self._add_text(_html.unescape(f"&#{name};"), len(name) + 3)


def segment_html(doc: str) -> list[Block]:
    """Decoded HTML document → ordered candidate blocks.

    Order is source order; block_idx is dense from 0 (the reference mints
    region ids by enumerate order, std-detection/api.py:91-108 — here the
    index is a real column from the start, never string-packed).
    """
    parser = _BlockParser(doc)
    parser.feed(doc)
    parser.close()
    parser._flush()
    return parser.blocks
