"""PII scrubbing — redaction pass for training-data curation.

Standard practice for web-corpus preparation: replace emails / IPv4
addresses / phone-like numbers with typed placeholder tokens before
text enters a training set. Pure ``regexp_replace`` chain (JVM-side,
whole-stage codegen — no Python in the hot path), with integer match
counts as evidence columns.

Engine portability is engineered the same way as urlkit: one
``_PII_STEPS`` list is the single source of truth; the DuckDB chain is
DERIVED from it (``PII_STEPS_SQL``), and the patterns use only
constructs with identical semantics in Java regex and RE2 (explicit
``[0-9]`` classes, no lookaround, no backreferences; ``\\b`` is an ASCII
word boundary in both on this corpus).

Order matters and is part of the spec: emails first (their local parts
contain digits), then IPv4 (so dotted quads don't half-match as
phones), then phone-like runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_SAMPLES",
    "PII_STEPS_SQL",
    "PII_COUNT_SQL",
    "scrub_pii",
    "with_scrubbed_text",
]

# (name, pattern, replacement) — applied in order.
_PII_STEPS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ip",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    # Three phone shapes, each with an unambiguous anchor so ordinary
    # numeric text (ISO dates, year/page ranges, spaced decimals) is
    # never swallowed — a redaction false positive silently corrupts
    # training text, so this rule trades recall for precision:
    #   1. international: leading '+' (the anchor), then grouped digits;
    #   2. parenthesized area code: (NNN) NNN?-NNNN;
    #   3. separator-delimited triple: 2-4 digits [-.] 3-4 [-.] 3-4 —
    #      dashes/dots only (no spaces), which excludes dates
    #      (4-2-2 / 2-2-4 group shapes don't fit 3-4 middle/tail runs).
    (
        "phone",
        r"\+[0-9]{1,3}[-. ]?\(?[0-9]{1,4}\)?(?:[-. ]?[0-9]{2,4}){1,4}"
        r"|\([0-9]{3}\)[-. ]?[0-9]{3}[-. ]?[0-9]{4}"
        r"|\b[0-9]{2,4}[-.][0-9]{3,4}[-.][0-9]{3,4}\b",
        "<PHONE>",
    ),
]

# Planted corpus exercising every rule (and the precedence rules):
# the driver query unions these under the documents table so the value
# check is never vacuous on a clean corpus. Single source of truth for
# the Spark query AND the DuckDB-oracle VALUES list.
PII_SAMPLES: list[str] = [
    "contact me at alice.smith+spam@example.co.uk for details",
    "server logs show 192.168.1.254 and 10.0.0.1 connecting",
    "call +1 (555) 867-5309 or 555-123-9876 today",
    "mixed: bob@test.org from 127.0.0.1 dialed (555) 123-4567",
    "no pii here, just plain text about spark partitions",
    "almost an ip 999.999 and almost a mail foo@bar but not quite",
    # numeric text that must SURVIVE the phone rule (precision cases)
    "released on 2026-08-17 and revised 17.08.2026 worldwide",
    "pages 1000-1150 cover it; score was 3.14159 26535 approx",
    "from 1914. 1918 ended it, and 10.15.7 is a version",
]


def scrub_pii(col: Column) -> Column:
    """Redacted form of a text column (chain of anchored replaces)."""
    out = col
    for _, pat, rep in _PII_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def with_scrubbed_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``scrubbed`` plus one integer match-count column per rule
    (n_email / n_ip / n_phone), counted BEFORE redaction. Counts are
    computed per step on the partially-scrubbed text, mirroring the
    replacement order, so precedence is observable (an IP inside an
    email is counted once, as the email)."""
    # staged: each step's input is the previous step's output, so the
    # chain is evaluated once per row (no multi-reference CSE hazard).
    # NULL→'' at the root: Spark's size(regexp_extract_all(NULL)) and
    # DuckDB's len(...) disagree on NULL, so neither engine ever sees one
    out = df.withColumn("_s0", F.coalesce(F.col(text_col), F.lit("")))
    counts = []
    for i, (name, pat, rep) in enumerate(_PII_STEPS):
        cur, nxt = f"_s{i}", f"_s{i + 1}"
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(cur), F.lit(pat), 0)),
        ).withColumn(nxt, F.regexp_replace(F.col(cur), pat, rep))
        counts.append(f"n_{name}")
    return out.withColumn(
        "scrubbed", F.col(f"_s{len(_PII_STEPS)}")
    ).drop(*[f"_s{i}" for i in range(len(_PII_STEPS) + 1)])


def _lit(s: str) -> str:
    """Single-quoted DuckDB string literal (quotes doubled — a pattern
    or replacement containing ``'`` must not silently break the derived
    oracle SQL)."""
    return "'" + s.replace("'", "''") + "'"


def PII_STEPS_SQL(c: str) -> str:
    """DuckDB expression for the scrubbed text, derived from the same
    _PII_STEPS list ('g' flag = Spark's replace-all semantics)."""
    expr = c
    for _, pat, rep in _PII_STEPS:
        expr = f"regexp_replace({expr}, {_lit(pat)}, {_lit(rep)}, 'g')"
    return expr


def PII_COUNT_SQL(c: str, step: int) -> str:
    """DuckDB expression for step ``step``'s match count: matches of the
    step's pattern in the text AFTER the previous steps' replacements
    (mirrors with_scrubbed_text's staging)."""
    expr = c
    for _, pat, rep in _PII_STEPS[:step]:
        expr = f"regexp_replace({expr}, {_lit(pat)}, {_lit(rep)}, 'g')"
    return f"len(regexp_extract_all({expr}, {_lit(_PII_STEPS[step][1])}))"
