"""Sharded inverted-index (postings) builder — the term → documents map
behind corpus search, decontamination lookups, and quality-signal
mining over a web-scale training corpus.

Reference analogy: the reference serves per-document results keyed by
job id (pipeline/app.py result store); the inverted index is the
transposed, corpus-level view — "which documents contain this term" —
that a data-curation team queries constantly (leaked-benchmark strings,
boilerplate markers, PII trigger terms).

Layout: rows (term, shard, df_shard, tf_shard, postings) where
``postings`` is the ASCENDING doc_id list of the term's documents in
that shard, ``shard = doc_id mod n_shards``. Global per-term stats are
window sums over the shard rows (compact: one row per term-shard).

Why sharded: the postings list of a stopword is the whole corpus — at
10^12 docs a single (term="the", postings) row would be a multi-GB
array in one task (the classic reducer-OOM skew). ``n_shards`` bounds
every row at n_docs/n_shards ids WITHOUT losing information (the full
list is the ordered concat of its shards), and shard rows of one term
land on different reducers, so the skewed key is load-spread too — the
same salting idea as partitioning.salt_hot_keys, but lossless because
the shard id is derivable from doc_id. min_df / max_df_frac bound the
vocabulary tail (hapaxes) and head (stopwords) when the index is for
lookup rather than audit.

Scale shape:
- one tokenize pass; the shuffle moves (term, doc_id) pairs — terms are
  whitespace tokens (short); document TEXT never crosses an exchange.
- two-level aggregation: (term, doc_id) tf first (map-side combinable),
  then (term, shard) packing; the df window runs over the packed rows
  (one per term-shard), not the token stream.
- postings are sorted in-group via sort_array after collect_list — a
  deterministic order both engines can replay (DuckDB:
  list(doc_id ORDER BY doc_id)).

DuckDB oracle: ``ix_postings`` in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens

__all__ = ["term_postings"]


def term_postings(
    docs: DataFrame,
    text_col: str = "text",
    n_shards: int = 1,
    min_df: int = 1,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Build the sharded postings table over whitespace tokens.

    Output: (term, shard, df_shard, tf_shard, df, postings) — df is the
    term's GLOBAL document frequency (same value on each of its shard
    rows); all counts bigint, postings array<bigint> ascending.

    ``min_df`` drops terms seen in fewer than min_df documents
    (hapax-legomena tail — typically >40% of a web vocabulary);
    ``max_df_frac`` drops terms seen in more than that fraction of the
    corpus (stopword head). Both filter on the global df, computed
    before the bounds are applied.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    term_doc = (
        docs.select(
            "doc_id", F.explode_outer(tokens(F.col(text_col))).alias("term")
        )
        .filter(F.col("term").isNotNull() & (F.col("term") != ""))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    packed = term_doc.groupBy(
        "term", (F.col("doc_id") % n_shards).alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("df_shard"),
        F.sum("tf").alias("tf_shard"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
    )
    w = Window.partitionBy("term")
    out = packed.withColumn("df", F.sum("df_shard").over(w)).filter(
        F.col("df") >= min_df
    )
    if max_df_frac is not None:
        n_docs = docs.select(
            F.count_distinct("doc_id").alias("_n")
        )
        out = out.crossJoin(F.broadcast(n_docs)).filter(
            F.col("df") <= F.col("_n") * max_df_frac
        )
        out = out.drop("_n")
    return out.select(
        "term", "shard", "df_shard", "tf_shard", "df", "postings"
    )
