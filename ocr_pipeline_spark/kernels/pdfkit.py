"""Minimal PDF text-layout extraction (pure Python, stdlib only).

The pdfminer-style layout pass the north rule adds on top of the reference
(SURVEY.md §2.7 K15): positioned text runs → lines (y-clustering) → blocks
(vertical-gap clustering) → reading order. This mirrors the reference's
pixel pipeline shape exactly — connected components over proximity
(std-detection/craft_utils.py:28-34), minAreaRect boxes (craft_utils.py:63),
clockwise reading order (craft_utils.py:72-74) — re-expressed over PDF
text-run coordinates.

Scope: uncompressed content streams with BT/ET text objects using
Tf/Td/TD/Tm positioning and Tj string-show — the subset emitted by
``build_pdf`` (the deterministic synthesizer used by tests/bench; the
container has no image/PDF libraries, so richer codecs are out of scope,
but the plumbing — bytes in, offset-addressed blocks out — is real).

Span offsets index into the latin-1 decoding of the PDF bytes (1:1
byte↔char, lossless), pointing at the literal string body of the first/last
run of each block.
"""

from __future__ import annotations

import re

from .htmlkit import Block

__all__ = ["build_pdf", "parse_pdf_blocks", "LINE_Y_TOLERANCE", "BLOCK_GAP"]

LINE_Y_TOLERANCE = 2.0   # runs within this |Δy| share a line
BLOCK_GAP = 18.0         # vertical gap between lines that splits blocks
_LEADING = 14            # synthetic line leading (points)

_TEXTOBJ_RE = re.compile(r"BT(.*?)ET", re.S)
_OP_RE = re.compile(
    r"(?P<a>-?\d+(?:\.\d+)?)\s+(?P<b>-?\d+(?:\.\d+)?)\s+(?P<op>Td|TD)"
    r"|\((?P<str>(?:[^()\\]|\\.)*)\)\s*Tj"
)
_ESCAPES = {"\\(": "(", "\\)": ")", "\\\\": "\\", "\\n": "\n", "\\r": "\r", "\\t": "\t"}


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        two = s[i : i + 2]
        if two in _ESCAPES:
            out.append(_ESCAPES[two])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def build_pdf(paragraphs: list[list[str]]) -> bytes:
    """Deterministic single-page mini-PDF: one Tj per line, paragraphs
    separated by an extra leading gap (> BLOCK_GAP), lines _LEADING apart."""
    ops = []
    y = 760
    for para in paragraphs:
        for line in para:
            ops.append(f"BT /F1 12 Tf 72 {y} Td ({_escape(line)}) Tj ET")
            y -= _LEADING
        y -= _LEADING  # paragraph gap: 2*_LEADING = 28 > BLOCK_GAP
    stream = "\n".join(ops).encode("latin-1", "replace")
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj",
        b"4 0 obj << /Length %d >> stream\n%s\nendstream endobj"
        % (len(stream), stream),
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj",
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF\n"


def parse_pdf_blocks(data: bytes) -> list[Block]:
    """PDF bytes → ordered Blocks (reading order: top→bottom, left→right)."""
    doc = data.decode("latin-1")
    runs = []  # (x, y, text, span_start, span_end)
    for tobj in _TEXTOBJ_RE.finditer(doc):
        x = y = 0.0
        base = tobj.start(1)
        for m in _OP_RE.finditer(tobj.group(1)):
            if m.group("op"):
                # Td/TD are relative moves in our subset (each BT resets)
                x += float(m.group("a"))
                y += float(m.group("b"))
            elif m.group("str") is not None:
                text = _unescape(m.group("str"))
                if text.strip():
                    runs.append(
                        (x, y, text, base + m.start("str"), base + m.end("str"))
                    )
    if not runs:
        return []

    # runs → lines: cluster by y (minAreaRect analogue, craft_utils.py:63)
    runs.sort(key=lambda r: (-r[1], r[0], r[3]))
    lines: list[list[tuple]] = []
    for r in runs:
        if lines and abs(lines[-1][0][1] - r[1]) <= LINE_Y_TOLERANCE:
            lines[-1].append(r)
        else:
            lines.append([r])
    for ln in lines:
        ln.sort(key=lambda r: (r[0], r[3]))  # reading order within line

    # lines → blocks: split on vertical gaps (component merge analogue)
    blocks: list[Block] = []
    groups: list[list[list[tuple]]] = []
    for ln in lines:
        if groups and (groups[-1][-1][0][1] - ln[0][1]) <= BLOCK_GAP:
            groups[-1].append(ln)
        else:
            groups.append([ln])
    for gi, group in enumerate(groups):
        text = " ".join(
            " ".join(r[2] for r in ln) for ln in group
        )
        text = " ".join(text.split())
        if not text:
            continue
        span_start = min(r[3] for ln in group for r in ln)
        span_end = max(r[4] for ln in group for r in ln)
        n = len(text)
        blocks.append(
            Block(
                block_idx=len(blocks),
                span_start=span_start,
                span_end=span_end,
                text=text,
                n_chars=n,
                n_link_chars=0,
                n_tags=0,
                tag_path="pdf/block",
                text_density=float(n),
                link_density=0.0,
            )
        )
    return blocks
