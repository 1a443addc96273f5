"""Fixed-point k-means: convergence, determinism, exactness invariants
(cross-engine parity runs in test_entry.py via ml_kmeans_cells)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_pipeline_spark.operators.clustering import (
    KM_SCALE,
    _trunc_div,
    kmeans_assign,
    kmeans_centroids,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_trunc_div_matches_engine_semantics():
    # Spark `div` / DuckDB `//` truncate toward zero; Python // floors
    assert _trunc_div(-7, 2) == -3 and -7 // 2 == -4
    assert _trunc_div(7, 2) == 3 and _trunc_div(0, 5) == 0


def test_assignments_partition_independent(spark):
    emb = spark.read.parquet(EMB)
    a = sorted(
        map(tuple, kmeans_assign(emb.repartition(1), k=4, iters=2).collect())
    )
    b = sorted(
        map(tuple, kmeans_assign(emb.repartition(7), k=4, iters=2).collect())
    )
    assert a == b
    assert len(a) == emb.count()


def test_inertia_never_increases_across_iterations(spark):
    emb = spark.read.parquet(EMB)
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * KM_SCALE + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("v"),
    )
    qrows = {r["vec_id"]: r["v"] for r in q.collect()}

    def inertia(cents):
        tot = 0
        for v in qrows.values():
            tot += min(
                sum((a - b) * (a - b) for a, b in zip(v, c))
                for c in cents.values()
            )
        return tot

    prev = None
    for iters in (0, 1, 2, 3):
        cur = inertia(kmeans_centroids(emb, k=4, iters=iters))
        if prev is not None:
            # Lloyd monotonicity holds up to the fixed-point rounding of
            # the centroid means: allow the quantization slack per dim
            assert cur <= prev + 64 * len(qrows)
        prev = cur
    # and it must actually improve over the raw init
    assert inertia(kmeans_centroids(emb, k=4, iters=3)) < inertia(
        kmeans_centroids(emb, k=4, iters=0)
    )


def test_bad_args_and_missing_init_ids_raise(spark):
    emb = spark.read.parquet(EMB)
    with pytest.raises(ValueError):
        kmeans_centroids(emb, k=0)
    shifted = emb.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    with pytest.raises(ValueError, match="init"):
        kmeans_centroids(shifted, k=4, iters=1)
