"""Benchmark decontamination — test-set n-gram overlap screening.

The pass every LLM training pipeline runs before training (GPT-3
appendix C / Gopher §A.8 style): a training document is flagged as
contaminated when a meaningful fraction of its distinct word n-grams
also occur in an evaluation-benchmark suite, so eval answers don't leak
into the training set.

Scale shape (the whole point at 100 TB): benchmark suites are tiny
(MBs) against the corpus, so the benchmark's gram-key set builds once,
deduplicates in a trivially small exchange, and BROADCASTS; corpus-side
grams are exploded map-side and matched inside the scan stage — gram
text never crosses a shuffle (CLAUDE.md payload rule: the broadcast
probe uses 16-hex md5 prefixes), and the only corpus-sized exchange is
the per-doc partial-agg on (doc_id, two ints).

Engine portability: gram construction reuses ``dedup.shingles``
semantics exactly (distinct word n-grams of normalized text; short docs
fall back to the whole normalized text), and ``GRAMS_SQL`` derives the
DuckDB expression from the same spec so the driver oracle replays it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _shingles_from
from .textstats import norm_text, tokens

__all__ = [
    "DEFAULT_NGRAM",
    "GRAMS_SQL",
    "contamination_flags",
    "gram_keys",
]

# 8-gram overlap is the published sweet spot: long enough that shared
# boilerplate phrases don't false-positive, short enough to catch
# paraphrase-free inclusion (GPT-3 used 13-gram spans, Gopher 8-grams).
DEFAULT_NGRAM = 8


def gram_keys(col: Column, n: int = DEFAULT_NGRAM) -> Column:
    """Array of 16-hex md5 keys of the distinct word n-grams of a text
    column (shingles semantics: docs shorter than n words contribute
    their whole normalized text as one gram)."""
    return F.transform(
        _shingles_from(tokens(col), norm_text(col), n),
        lambda g: F.substring(F.md5(F.encode(g, "UTF-8")), 1, 16),
    )


def GRAMS_SQL(c: str, n: int = DEFAULT_NGRAM) -> str:
    """DuckDB expression for the same distinct n-gram list (pre-hash),
    derived from the shingles spec — mirror of ``dedup.shingles``."""
    norm = f"trim(regexp_replace(lower(coalesce({c}, '')), '\\s+', ' ', 'g'))"
    toks = f"string_split({norm}, ' ')"
    return (
        f"case when len({toks}) < {n} then [{norm}] else "
        f"list_distinct(list_transform(range(0, len({toks}) - {n - 1}), "
        f"i -> array_to_string(({toks})[i+1:i+{n}], ' '))) end"
    )


def contamination_flags(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DEFAULT_NGRAM,
    threshold_pct: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination screen against a benchmark suite.

    ``bench``: DataFrame with a ``text`` column (the benchmark items —
    questions, answers, passages). Output per input doc:
    (doc_id, n_grams, n_hit, is_contaminated) where ``n_grams`` counts
    the doc's distinct n-grams, ``n_hit`` how many occur anywhere in the
    benchmark, and ``is_contaminated`` is the integer-exact threshold
    test 100·n_hit ≥ threshold_pct·n_grams.

    Plan: benchmark grams → distinct md5-prefix keys (tiny) → broadcast;
    corpus grams explode map-side, probe the broadcast, and partial-agg
    to (doc_id, n_grams, n_hit) — ONE corpus-sized exchange, carrying
    three shorts. No gram string ever shuffles; pinned by
    tests/test_plans.py.
    """
    bench_keys = (
        bench.select(
            F.explode_outer(gram_keys(F.col(text_col), n)).alias("gk")
        )
        .filter(F.col("gk").isNotNull())
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # staged projection: the gram-key array is computed once per row
    # (explode_outer, not explode — InferFiltersFromGenerate would push
    # the whole tokenize+hash tree into a Filter and re-inline it per
    # element; the array is never empty, so rows are identical)
    sh = docs.select(
        "doc_id", gram_keys(F.col(text_col), n).alias("_gks")
    )
    ex = (
        sh.select(
            "doc_id",
            F.size("_gks").alias("_n_grams"),
            F.explode_outer("_gks").alias("gk"),
        )
        .filter(F.col("gk").isNotNull())
    )
    per_doc = (
        ex.join(F.broadcast(bench_keys), "gk", "left")
        .groupBy("doc_id")
        .agg(
            F.max("_n_grams").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_hit",
        (
            F.lit(100) * F.col("n_hit")
            >= F.lit(threshold_pct) * F.col("n_grams")
        ).alias("is_contaminated"),
    )
