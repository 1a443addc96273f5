"""KMV distinct-count sketch: accuracy, exact fallback, merge property."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_pipeline_spark.operators.sketch import kmv_distinct


def test_estimate_within_sketch_error(spark):
    # 20_000 distinct values, k=128 → expected relative error ~1/sqrt(126)
    df = spark.range(20_000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    row = kmv_distinct(df, "grp", "v", k=128).first()
    assert row["n_hashes"] == 128
    assert abs(row["est_distinct"] - 20_000) / 20_000 < 0.3
    # duplicates must not change a distinct-count sketch
    dup = df.union(df)
    row2 = kmv_distinct(dup, "grp", "v", k=128).first()
    assert row2["est_distinct"] == row["est_distinct"]


def test_exact_fallback_below_k(spark):
    df = spark.range(37).select(
        (F.col("id") % 2).alias("grp"), F.col("id").alias("v")
    )
    rows = {r["grp"]: r for r in kmv_distinct(df, "grp", "v", k=128).collect()}
    assert rows[0]["est_distinct"] == 19.0   # exact counts, not estimates
    assert rows[1]["est_distinct"] == 18.0


def test_merge_property(spark):
    """Union-then-sketch equals sketch of the union — partitioning the
    input cannot change the k smallest hashes (the distributivity that
    lets partitions/increments merge without rescans)."""
    a = spark.range(0, 5_000)
    b = spark.range(3_000, 9_000)   # overlapping halves
    whole = (
        a.union(b)
        .select(F.lit("g").alias("grp"), F.col("id").alias("v"))
    )
    one = kmv_distinct(whole, "grp", "v", k=64).first()
    two = kmv_distinct(whole.repartition(17), "grp", "v", k=64).first()
    assert (one["kth_hash"], one["est_distinct"]) == (
        two["kth_hash"],
        two["est_distinct"],
    )
