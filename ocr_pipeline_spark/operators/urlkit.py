"""URL canonicalization — the key-normalization layer under web-scale
dedup and partitioning.

Exact-dup url keys, hash(url) bucketing, and domain salting all assume
one url string per logical resource; raw crawl urls violate that
(scheme/host case, default ports, fragments, trailing '?', '/index.html'
tails). ``canonical_url`` is a deterministic, engine-portable rewrite
chain (pure regexp_replace steps, identical in the DuckDB oracle — no
URL library whose version could drift).

Steps, in order (each a single anchored regex):
1. lowercase the scheme://host prefix (path case is significant, host
   case is not);
2. drop the fragment (#…);
3. drop default ports — ``:80`` on http and ``:443`` on https only,
   anchored to the authority (a ``:80`` inside the path is untouched);
4. drop a bare trailing '?';
5. strip one trailing '/' — including the root slash, so
   ``scheme://host`` is the canonical root form;
6. drop a trailing '/index.html' (directory-default tail; running after
   the slash strip makes '/a/index.html/' canonicalize in one pass).

``host_of``/``domain_suffix`` expose the pieces partitioning uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_url", "with_canonical_url", "CANON_STEPS_SQL", "EDGE_URLS"]

# Edge-case corpus exercising every rewrite step (and the anchoring
# regressions). Single source of truth: tests/test_urlkit.py pins the
# expected canonical forms, and __spark_entry__'s url_canonical query +
# DuckDB oracle both take their input rows from this list.
EDGE_URLS: list[str] = [
    "HTTPS://Example.COM/Path/Page",
    "http://example.com:80/a",
    "https://example.com:443/a?q=1",
    "https://example.com:8443/a",
    "https://example.com/a#frag",
    "https://example.com/a?",
    "https://example.com/dir/index.html",
    "https://example.com/a/",
    "https://example.com/",
    "https://example.com/a?x=1&y=2",
    "https://example.com/story:80/page",
    "http://example.com:443/a",
    "https://example.com/a/index.html/",
    "http://example.com:80/a:80/b",
]

# (pattern, replacement) pairs applied in order; the DuckDB chain is
# DERIVED from this list (single source of truth). Port rules are
# anchored to the authority and scheme-conditional (:443 is NOT a
# default for http); trailing-slash strip runs BEFORE the index.html
# rule so '/a/index.html/' canonicalizes in one pass (idempotence).
_STEPS: list[tuple[str, str]] = [
    (r"#.*$", ""),                                       # fragment
    (r"^(http://[^/:?#]*):80(/|\?|$)", r"$1$2"),          # default http port
    (r"^(https://[^/:?#]*):443(/|\?|$)", r"$1$2"),        # default https port
    (r"\?$", ""),                                         # bare trailing ?
    (r"([^/])/$", r"$1"),                                 # trailing slash
    (r"/index\.html?$", ""),                              # directory default
]


def canonical_url(col: Column) -> Column:
    """Deterministic canonical form of a url string column."""
    # lowercase the scheme://host prefix (everything before the first
    # '/', '?' or '#' after '://'); path/query case is preserved
    scheme_host = F.regexp_extract(col, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    tail = F.substring(col, F.length(scheme_host) + F.lit(1), F.lit(1 << 20))
    out = F.concat(F.lower(scheme_host), tail)
    for pat, rep in _STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("canonical_url", canonical_url(F.col(url_col)))


# DuckDB chain mirroring canonical_url, as a SQL expression over {c}.
def CANON_STEPS_SQL(c: str) -> str:
    expr = (
        f"concat(lower(regexp_extract({c}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)), "
        f"substring({c}, length(regexp_extract({c}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)) + 1))"
    )
    for pat, rep in _STEPS:
        # derived from _STEPS: only group syntax differs ($1 → \1);
        # DuckDB standard strings keep backslashes literal (no doubling);
        # 'g' flag matches Spark's replace-all semantics
        duck_rep = rep.replace("$", "\\")
        expr = f"regexp_replace({expr}, '{pat}', '{duck_rep}', 'g')"
    return expr
