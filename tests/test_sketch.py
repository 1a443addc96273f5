"""KMV distinct-count sketch: accuracy, exact fallback, NULL exclusion,
true state-merge property."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_pipeline_spark.operators.textstats import tokens
from ocr_pipeline_spark.operators.sketch import (
    kmv_distinct,
    kmv_from_state,
    kmv_state,
)


def test_estimate_within_sketch_error(spark):
    # 20_000 distinct values, k=128 → expected relative error ~1/sqrt(126)
    df = spark.range(20_000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    row = kmv_distinct(df, "grp", "v", k=128).first()
    assert row["n_hashes"] == 128
    assert abs(row["est_distinct"] - 20_000) / 20_000 < 0.3
    assert isinstance(row["est_distinct"], int)  # bigint, not a double
    # duplicates must not change a distinct-count sketch
    dup = df.union(df)
    row2 = kmv_distinct(dup, "grp", "v", k=128).first()
    assert row2["est_distinct"] == row["est_distinct"]


def test_exact_fallback_below_k(spark):
    df = spark.range(37).select(
        (F.col("id") % 2).alias("grp"), F.col("id").alias("v")
    )
    rows = {r["grp"]: r for r in kmv_distinct(df, "grp", "v", k=128).collect()}
    assert rows[0]["est_distinct"] == 19   # exact counts, not estimates
    assert rows[1]["est_distinct"] == 18


def test_null_values_are_not_counted(spark):
    df = spark.createDataFrame(
        [("g", "a"), ("g", "b"), ("g", None), ("g", "c")],
        "grp string, v string",
    )
    row = kmv_distinct(df, "grp", "v", k=4).first()
    # NULL is not a value: 3 distinct, and the NULL hash must not evict
    # a real hash from the top-k
    assert row["n_hashes"] == 3 and row["est_distinct"] == 3


def test_state_merge_equals_sketch_of_union(spark):
    """TRUE mergeability: sketch each increment separately, union the
    states, re-select k — must equal sketching the union directly."""
    a = spark.range(0, 5_000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    b = spark.range(3_000, 9_000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    merged = kmv_from_state(
        kmv_state(a, "grp", "v", k=64).union(kmv_state(b, "grp", "v", k=64)),
        k=64,
    ).first()
    direct = kmv_distinct(a.union(b), "grp", "v", k=64).first()
    assert (merged["kth_hash"], merged["est_distinct"]) == (
        direct["kth_hash"],
        direct["est_distinct"],
    )


def test_partition_invariance(spark):
    whole = spark.range(9_000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    one = kmv_distinct(whole, "grp", "v", k=64).first()
    two = kmv_distinct(whole.repartition(17), "grp", "v", k=64).first()
    assert (one["kth_hash"], one["est_distinct"]) == (
        two["kth_hash"],
        two["est_distinct"],
    )


def test_cms_estimate_upper_bounds_exact_counts(spark):
    from ocr_pipeline_spark.operators.sketch import cms_estimate, cms_state

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        F.explode_outer(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok").isNotNull())
    exact = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    state = cms_state(toks, "tok")
    probes = ["the", "data", "query", "zzz-not-in-corpus"]
    est = {
        r["value"]: r["est"]
        for r in cms_estimate(state, probes).collect()
    }
    assert set(est) == set(probes)
    for v in probes:
        assert est[v] >= exact.get(v, 0)  # CMS never undercounts
    # depth×width bound: total cells capped, every row sums to N
    cells = state.collect()
    n = toks.count()
    import collections

    per_row = collections.Counter()
    for c in cells:
        per_row[c["row_idx"]] += c["cnt"]
    assert all(v == n for v in per_row.values())


def test_cms_states_merge_by_cellwise_sum(spark):
    from ocr_pipeline_spark.operators.sketch import cms_state

    a = spark.createDataFrame([("x",), ("y",), ("x",)], "v string")
    b = spark.createDataFrame([("x",), ("z",)], "v string")
    both = a.union(b)
    merged = (
        cms_state(a, "v")
        .union(cms_state(b, "v"))
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_state(both, "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hist_quantiles_bounds_and_exact_small_span(spark):
    import math
    import random

    from ocr_pipeline_spark.operators.sketch import hist_quantiles

    rng = random.Random(7)
    rows = [(("g1", rng.randrange(0, 100_000)) if i % 2 else
             ("g2", rng.randrange(50, 90))) for i in range(4_000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {
        r["grp"]: r
        for r in hist_quantiles(df, "grp", "v", bins=64).collect()
    }

    by_grp: dict[str, list[int]] = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    for g, vals in by_grp.items():
        vals.sort()
        r = out[g]
        assert r["n"] == len(vals)
        for p_bp, col in ((5000, "est_p50"), (9000, "est_p90"),
                          (9900, "est_p99")):
            exact = vals[math.ceil(p_bp * len(vals) / 10_000) - 1]
            # estimate is the containing bin's LOWER bound
            assert r[col] <= exact < r[col] + r["bin_width"], (
                g, col, exact, r[col], r["bin_width"])
    # span < bins → bin width 1 → exact quantiles
    assert out["g2"]["bin_width"] == 1
    g2 = sorted(v for g, v in rows if g == "g2")
    assert out["g2"]["est_p50"] == g2[math.ceil(0.5 * len(g2)) - 1]


def test_hist_quantiles_partition_invariance_and_nulls(spark):
    from ocr_pipeline_spark.operators.sketch import hist_quantiles

    df = spark.createDataFrame(
        [("a", i * 3 % 1000 if i % 17 else None) for i in range(2_000)],
        "grp string, v long",
    )
    a = sorted(hist_quantiles(df, "grp", "v").collect())
    b = sorted(hist_quantiles(df.repartition(11), "grp", "v").collect())
    assert a == b
    # NULLs excluded from n
    assert a[0]["n"] == df.filter(F.col("v").isNotNull()).count()


def test_kmv_set_estimates_exact_small_and_jaccard(spark):
    """Small sets (union < k): every estimate degenerates to the exact
    count and jaccard_bp is exact; disjoint and identical sets hit the
    0 / 10000 poles."""
    from ocr_pipeline_spark.operators.sketch import kmv_set_estimates

    rows = [("a", f"v{i}") for i in range(10)]
    rows += [("b", f"v{i}") for i in range(5, 15)]     # overlap = 5
    df = spark.createDataFrame(rows, "grp string, val string")
    r = kmv_set_estimates(df, "grp", "val", "a", "b", k=64).first()
    assert (r["n_a"], r["n_b"]) == (10, 10)
    assert (r["est_a"], r["est_b"]) == (10, 10)
    assert r["n_union"] == 15 and r["est_union"] == 15
    assert r["n_inter"] == 5 and r["est_intersection"] == 5
    assert r["jaccard_bp"] == (10000 * 5) // 15

    dj = spark.createDataFrame(
        [("a", "x1"), ("a", "x2"), ("b", "y1")], "grp string, val string"
    )
    r2 = kmv_set_estimates(dj, "grp", "val", "a", "b", k=64).first()
    assert r2["n_inter"] == 0 and r2["jaccard_bp"] == 0

    ident = spark.createDataFrame(
        [(g, f"v{i}") for g in ("a", "b") for i in range(8)],
        "grp string, val string",
    )
    r3 = kmv_set_estimates(ident, "grp", "val", "a", "b", k=64).first()
    assert r3["jaccard_bp"] == 10000
    assert r3["est_intersection"] == 8


def test_kmv_set_estimates_sketched_accuracy(spark):
    """Full sketches (union >> k): estimates land within the standard
    KMV relative-error envelope (~1/sqrt(k))."""
    from ocr_pipeline_spark.operators.sketch import kmv_set_estimates

    rows = [("a", f"v{i}") for i in range(2000)]
    rows += [("b", f"v{i}") for i in range(1000, 3000)]   # union 3000, inter 1000
    df = spark.createDataFrame(rows, "grp string, val string")
    r = kmv_set_estimates(df, "grp", "val", "a", "b", k=256).first()
    assert abs(r["est_union"] - 3000) < 3000 * 0.25
    assert abs(r["est_intersection"] - 1000) < 1000 * 0.5
    assert abs(r["jaccard_bp"] - 3333) < 1500
