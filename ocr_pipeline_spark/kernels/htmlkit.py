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

Determinism contract: a self-contained regex/str.find scanner — THIS file
is the segmentation spec (no version-floating third-party parser, no
stdlib html.parser internals). Every token carries its exact source
offset, so spans index into the decoded document. The scanner replaced a
stdlib-HTMLParser implementation for ~2× kernel throughput; block
outputs depend only on token positions, which both produce identically
for well-formed markup (goldens were regenerated for the truncated-
markup edge fixtures where recovery behavior is scanner-defined).

Scanner semantics (the spec):
- ``<!-- … -->`` comments, ``<! … >`` declarations and ``<? … >`` PIs are
  skipped (no events, positions advance; unterminated → rest of doc);
- start tags allow quoted attributes containing ``>``; a ``/`` before the
  closing ``>`` makes it self-closing;
- ``<`` that does not begin a recognizable construct is literal text;
- ``script``/``style`` bodies are raw text up to the next matching
  case-insensitive close tag (suppressed as _SKIP_TAGS anyway);
  ``noscript``/``template`` contents parse normally but their text is
  suppressed via the skip depth;
- entities: ``&name[;]`` / ``&#123;`` / ``&#xAB;`` unescape via
  html.unescape (semicolon-less named forms follow the HTML5 legacy
  longest-match rules); other ``&…`` is literal text;
- a ``/`` before the closing ``>`` marks a tag self-closing only when it
  is not part of an unquoted attribute value (``<a href=https://x/>``
  is an open tag with value ``https://x/``, as in browsers).
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass

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


# -- scanner tokens ---------------------------------------------------------

_STARTTAG_RE = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:._-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>"
)
_ENDTAG_RE = re.compile(
    r"</\s*([a-zA-Z][a-zA-Z0-9:._-]*)(?:\"[^\"]*\"|'[^']*'|[^>\"'])*>"
)
# named entities: semicolon optional (crawl HTML is full of '&nbsp ' —
# html.unescape applies the HTML5 legacy longest-match rules either way);
# numeric refs require the semicolon
_ENTITY_RE = re.compile(
    r"&(?:[a-zA-Z][-.a-zA-Z0-9]*;?|#[0-9]+;|#[xX][0-9a-fA-F]+;)"
)
_RAW_CLOSE = {
    t: re.compile(rf"</\s*{t}\b", re.I) for t in ("script", "style")
}


class _BlockState:
    """Block-formation state machine; the scanner feeds it positioned
    events. Logic is the CETD/Boilerpipe-style merge: text accumulates
    until a block-level boundary, carrying link-char and tag counts."""

    __slots__ = (
        "blocks", "_stack", "_skip_depth", "_a_depth", "_parts",
        "_span_start", "_span_end", "_link_chars", "_tags_in_block", "_path",
    )

    def __init__(self) -> None:
        self.blocks: list[Block] = []
        self._stack: list[str] = []
        self._skip_depth = 0
        self._a_depth = 0
        self._parts: list[str] = []
        self._span_start: int | None = None
        self._span_end = 0
        self._link_chars = 0
        self._tags_in_block = 0
        self._path = ""

    def flush(self) -> None:
        if not self._parts:
            if self._span_start is None:
                self._link_chars = 0
                self._tags_in_block = 0
                self._path = ""
                return
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

    def add_text(self, unescaped: str, pos: int, raw_len: int) -> None:
        if self._skip_depth:
            return
        stripped = unescaped.strip()
        if stripped:
            raw_is_text = raw_len == len(unescaped)
            if self._span_start is None:
                # offset of first non-ws char within the raw token: for data
                # tokens raw == unescaped; entity tokens are atomic non-ws.
                lead = (
                    len(unescaped) - len(unescaped.lstrip())
                    if raw_is_text
                    else 0
                )
                self._span_start = pos + lead
                self._path = "/".join(self._stack)
            trail = (
                len(unescaped) - len(unescaped.rstrip()) if raw_is_text else 0
            )
            self._span_end = pos + raw_len - trail
            if self._a_depth:
                self._link_chars += len(" ".join(unescaped.split()))
        self._parts.append(unescaped)

    def starttag(self, tag: str, selfclosing: bool) -> None:
        if selfclosing:  # same handling for skip and normal tags
            if tag in _BLOCK_TAGS:
                self.flush()
            elif self._span_start is not None:
                self._tags_in_block += 1
            return
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            self.flush()
            return
        if tag in _BLOCK_TAGS:
            self.flush()
        if tag == "a":
            self._a_depth += 1
        if tag not in _VOID_TAGS:
            self._stack.append(tag)
        if self._span_start is not None:
            self._tags_in_block += 1

    def endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self.flush()
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in self._stack:  # defensive pop for malformed nesting
            while self._stack and self._stack[-1] != tag:
                self._stack.pop()
            if self._stack:
                self._stack.pop()


def _emit_text(state: _BlockState, text: str, base: int) -> None:
    """Split a raw text run into data/entity events with exact offsets."""
    last = 0
    for m in _ENTITY_RE.finditer(text):
        if m.start() > last:
            seg = text[last : m.start()]
            state.add_text(seg, base + last, len(seg))
        state.add_text(
            _html.unescape(m.group(0)), base + m.start(), m.end() - m.start()
        )
        last = m.end()
    if last < len(text):
        seg = text[last:]
        state.add_text(seg, base + last, len(seg))


def segment_html(doc: str) -> list[Block]:
    """Decoded HTML document → ordered candidate blocks.

    Order is source order; block_idx is dense from 0 (the reference mints
    region ids by enumerate order, std-detection/api.py:91-108 — here the
    index is a real column from the start, never string-packed).
    """
    state = _BlockState()
    pos = 0
    n = len(doc)
    find = doc.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            _emit_text(state, doc[pos:], pos)
            break
        if lt > pos:
            _emit_text(state, doc[pos:lt], pos)
        nxt = doc[lt + 1 : lt + 2]
        if doc.startswith("<!--", lt):
            end = find("-->", lt + 4)
            pos = n if end < 0 else end + 3
        elif nxt in ("!", "?"):
            end = find(">", lt)
            pos = n if end < 0 else end + 1
        elif nxt == "/":
            m = _ENDTAG_RE.match(doc, lt)
            if m:
                state.endtag(m.group(1).lower())
                pos = m.end()
            else:
                _emit_text(state, "<", lt)
                pos = lt + 1
        elif nxt.isalpha() if nxt else False:
            m = _STARTTAG_RE.match(doc, lt)
            if m:
                tag = m.group(1).lower()
                attrs = m.group(2).rstrip()
                # '/' is the self-closing marker only when standalone —
                # not when it ends an unquoted attribute value
                # (<a href=https://x/> keeps the slash in the value)
                selfclosing = attrs.endswith("/") and (
                    len(attrs) == 1 or attrs[-2] in " \t\n\r\f\"'"
                )
                state.starttag(tag, selfclosing)
                pos = m.end()
                if tag in _RAW_CLOSE and not selfclosing:
                    cm = _RAW_CLOSE[tag].search(doc, pos)
                    raw_end = cm.start() if cm else n
                    state.add_text(
                        doc[pos:raw_end], pos, raw_end - pos
                    )  # suppressed by skip depth
                    pos = raw_end
            else:
                _emit_text(state, "<", lt)
                pos = lt + 1
        else:
            _emit_text(state, "<", lt)
            pos = lt + 1
    state.flush()
    return state.blocks
