"""Deterministic KMV (k-minimum-values) distinct-count sketch.

Cardinality estimation is a staple of corpus analytics (distinct tokens
per source, distinct urls per domain) — but the built-in estimators
(Spark's HyperLogLog++ ``approx_count_distinct``, DuckDB's
``approx_count_distinct``) are engine-specific: same data, different
estimates, no cross-engine value check. This sketch is the
engine-portable alternative: hash every distinct value with the md5
recipe shared by the whole engine, keep the k smallest hashes, estimate

    N̂ = (k - 1) · P / h_(k)

where h_(k) is the k-th smallest hash and P = 2^48 the hash range (Beyer et
al., "On synopses for distinct-value estimation under multiset
operations", SIGMOD'07). Everything is integer/bigint until one final
division of identical operands — bit-identical across engines, so the
DuckDB oracle checks VALUES, not just shape.

Scale + mergeability: the per-group state is k bigints, built by
map-side partial aggregation on (group, hash) then a k-smallest
selection; two sketches merge as the k smallest of their union
(distributive), so partitions / increments / cluster nodes combine
without rescanning — the property that makes a sketch a sketch.
Relative error ≈ 1/√(k−2) (~10% at k=128).

Groups with < k distinct values fall back to their exact distinct count
(the sketch holds ALL their hashes — the estimate would be biased, the
exact count is free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _token_hash

# Hash range of _token_hash (first 12 md5 hex chars → [0, 2^48)).
HASH_RANGE = 1 << 48

__all__ = ["kmv_distinct", "HASH_RANGE"]


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 128,
) -> DataFrame:
    """Per-group distinct-count estimate:
    (group, n_hashes, kth_hash, est_distinct).

    Shuffle accounting: values hash scan-local; the (group, hash)
    dedup + k-smallest selection shuffle short keys only (the value
    itself never moves past the first projection)."""
    hashes = (
        df.select(
            F.col(group_col).alias("grp"),
            _token_hash(F.col(value_col).cast("string")).alias("h"),
        )
        .groupBy("grp", "h")
        .agg(F.lit(1).alias("_one"))
    )
    w = Window.partitionBy("grp").orderBy("h")
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    per_grp = topk.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("h").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_hashes") < k,
        F.col("n_hashes").cast("double"),  # exact: sketch saw everything
    ).otherwise(
        F.round(
            F.lit(float(k - 1))
            * F.lit(HASH_RANGE)
            / F.greatest(F.col("kth_hash"), F.lit(1)),
            2,
        )
    )
    return per_grp.select(
        F.col("grp").alias(group_col),
        "n_hashes",
        "kth_hash",
        est.alias("est_distinct"),
    )
