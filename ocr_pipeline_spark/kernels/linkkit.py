"""Anchor-link extraction kernel — pure Python, Spark-free
(kernel-is-spec, CLAUDE.md): the same function computes the pytest /
driver-oracle expectations and runs inside the Arrow batches.

Reference analogy: the reference emits per-region bbox/text results
(pipeline/file_utils.py TSV lines); links are the web corpus's
equivalent side-channel — the crawl-frontier feed and the edge list of
the page graph (kernels extract text for TRAINING, links for
CRAWLING/RANKING).

Scope, deliberately small and exact:
- ``extract_links`` scans start tags for ``<a ... href=...>`` values in
  source order — quoted (single/double) and unquoted attribute values
  per the WHATWG attribute grammar subset the htmlkit tokenizer also
  accepts (an unquoted value ends at whitespace or '>'; a trailing '/'
  of a self-closing tag is part of an unquoted value, htmlkit.py:298
  precedent). Anchors inside comments/scripts are NOT suppressed — the
  linker is a one-pass scanner by design; pages where that matters go
  through the full block segmenter.
- ``resolve_href`` joins a href against its page url: absolute
  http(s) passes through, root-relative ('/path') resolves against the
  page's scheme+host, everything else (fragments, mailto:, protocol-
  relative, dotted-relative) returns None — the conservative subset a
  frontier actually enqueues.
"""

from __future__ import annotations

import re

__all__ = ["extract_links", "resolve_href"]

# <a ...href=VALUE  — VALUE is "..." | '...' | unquoted-until-ws-or->
_HREF_RE = re.compile(
    r"<a(?:\s[^>]*?)?\shref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.IGNORECASE | re.ASCII,
)

_SCHEME_HOST_RE = re.compile(r"^(https?://[^/?#]+)", re.ASCII)


def extract_links(doc: str) -> list[str]:
    """Ordered href values of every <a> start tag in the document."""
    out: list[str] = []
    for m in _HREF_RE.finditer(doc or ""):
        href = m.group(1)
        if href is None:
            href = m.group(2)
        if href is None:
            href = m.group(3) or ""
        out.append(href)
    return out


def resolve_href(base_url: str, href: str) -> str | None:
    """Absolute http(s) url for a href, or None if out of scope."""
    if href.startswith("http://") or href.startswith("https://"):
        return href
    if href.startswith("//") or not href.startswith("/"):
        return None
    m = _SCHEME_HOST_RE.match(base_url or "")
    if not m:
        return None
    return m.group(1) + href
