"""Z-order layout: cross-engine z-value parity, clustering property,
and plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_pipeline_spark.operators.layout import (
    ZBITS,
    with_zvalue,
    write_zorder,
    zvalue_sql,
)


def _morton_ref(vals: list[int], bits: int) -> int:
    """Independent pure-Python Morton reference (bit-by-bit, no shared
    code with the operator's term enumeration)."""
    k = len(vals)
    z = 0
    for c, v in enumerate(vals):
        for i in range(bits):
            if (v >> i) & 1:
                z |= 1 << (i * k + c)
    return z


def _quant_ref(v: int, lo: int, hi: int, bits: int) -> int:
    return ((v - lo) * ((1 << bits) - 1)) // max(hi - lo, 1)


@pytest.fixture(scope="module")
def grid_df(spark):
    rows = [(i, (i * 37) % 101, (i * 53) % 211) for i in range(400)]
    return spark.createDataFrame(rows, "id long, a long, b long")


def test_zvalue_matches_python_reference(grid_df):
    got = {
        r["id"]: r["zval"]
        for r in with_zvalue(grid_df, ["a", "b"], bits=8).collect()
    }
    rows = grid_df.collect()
    alo, ahi = min(r.a for r in rows), max(r.a for r in rows)
    blo, bhi = min(r.b for r in rows), max(r.b for r in rows)
    for r in rows:
        want = _morton_ref(
            [_quant_ref(r.a, alo, ahi, 8), _quant_ref(r.b, blo, bhi, 8)], 8
        )
        assert got[r.id] == want


def test_zvalue_matches_duckdb_sql(grid_df):
    """The generated DuckDB interleave over the same quantization must
    be bit-identical to the Spark column — the sp_zorder oracle
    contract."""
    pdf = grid_df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    zsql = zvalue_sql(["_q0", "_q1"], ZBITS)
    mask = (1 << ZBITS) - 1
    oracle = {
        int(i): int(z)
        for i, z in con.execute(
            f"""
            WITH b AS (SELECT min(a) lo0, max(a) hi0,
                              min(b) lo1, max(b) hi1 FROM t),
            q AS (SELECT id,
                   cast((a - lo0) * {mask} // greatest(hi0 - lo0, 1)
                        as bigint) AS _q0,
                   cast((b - lo1) * {mask} // greatest(hi1 - lo1, 1)
                        as bigint) AS _q1
                  FROM t, b)
            SELECT id, ({zsql}) AS zval FROM q
            """
        ).fetchall()
    }
    got = {
        r["id"]: r["zval"] for r in with_zvalue(grid_df, ["a", "b"]).collect()
    }
    assert got == oracle


def test_explicit_bounds_single_scan(grid_df):
    """bounds=... must not add the min/max pre-scan (no join at all)."""
    df = with_zvalue(grid_df, ["a", "b"], bounds=[(0, 100), (0, 210)])
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    # and the computed-bounds path is exactly one broadcast scalar join
    df2 = with_zvalue(grid_df, ["a", "b"])
    plan2 = df2._jdf.queryExecution().optimizedPlan().toString()
    assert plan2.count("Join") == 1


def test_write_zorder_clusters_files(spark, tmp_path):
    """Data-skipping property: per-file bounding rectangles (the
    min/max stats a reader prunes on) must cover a small fraction of
    the key space, vs ~full coverage for an unordered shuffle."""
    n = 4096
    rows = [(i, (i * 2654435761) % 256, (i * 40503) % 256) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, a long, b long")

    zpath = str(tmp_path / "z")
    upath = str(tmp_path / "u")
    write_zorder(df, zpath, ["a", "b"], n_files=16, bounds=[(0, 255), (0, 255)])
    df.repartition(16).write.parquet(upath)

    def file_volume(path: str) -> int:
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("a").alias("alo"), F.max("a").alias("ahi"),
                F.min("b").alias("blo"), F.max("b").alias("bhi"),
            )
            .collect()
        )
        return sum(
            (r.ahi - r.alo + 1) * (r.bhi - r.blo + 1) for r in per_file
        )

    zvol, uvol = file_volume(zpath), file_volume(upath)
    # 16 z-files tile 256×256 into ~16 rectangles (~65k total); a random
    # shuffle gives every file nearly the full square (~16 × 65k).
    assert zvol < uvol / 4
    # content is unchanged
    assert (
        spark.read.parquet(zpath).orderBy("id").collect()
        == df.orderBy("id").collect()
    )


def test_write_zorder_plan_is_range_partitioned(spark, tmp_path, grid_df):
    """Pin the intended physical shape: ONE range-partitioning exchange
    on the z-long (short key — payload crosses once, as any clustered
    write must), no extra shuffles."""
    z = with_zvalue(grid_df, ["a", "b"], bounds=[(0, 100), (0, 210)])
    staged = (
        z.repartitionByRange(8, "zval").sortWithinPartitions("zval").drop("zval")
    )
    plan = staged._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("rangepartitioning") == 1
    assert plan.count("Exchange") == 1


def test_zvalue_sql_term_count():
    sql = zvalue_sql(["x", "y", "w"], 4)
    assert sql.count("|") == 3 * 4 - 1


def test_bounds_arity_checked(grid_df):
    with pytest.raises(ValueError):
        with_zvalue(grid_df, ["a", "b"], bounds=[(0, 1)])


def test_width_guard(grid_df):
    """Spark shiftleft masks shifts mod 64 (silently wrong) where
    DuckDB raises — configs past 63 z-bits must fail loudly instead."""
    with pytest.raises(ValueError, match="63"):
        with_zvalue(grid_df, ["a", "b"], bits=32)
    with pytest.raises(ValueError, match="63"):
        zvalue_sql(["q0", "q1", "q2", "q3", "q4"], 16)


def test_explicit_bounds_clamp(spark):
    """Stragglers outside declared bounds must clamp to the edge cells,
    never overflow into other columns' interleave bits."""
    df = spark.createDataFrame(
        [(1, -50, 5), (2, 500, 5), (3, 100, 5)], "id long, a long, b long"
    )
    got = {
        r["id"]: r["zval"]
        for r in with_zvalue(df, ["a", "b"], bits=8, bounds=[(0, 255), (0, 255)]).collect()
    }
    lo = _morton_ref([0, 5], 8)
    hi = _morton_ref([255, 5], 8)
    assert got[1] == lo and got[2] == hi
    assert got[1] < got[3] < got[2]


def test_wide_span_divide_first(spark):
    """Spans past 2^46 switch to the overflow-free divide-first form on
    BOTH bounds paths (ANSI mode would abort the multiply)."""
    lo, hi = 0, 1 << 55
    vals = [0, 1 << 40, 1 << 54, hi]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, a long")
    step = ((hi - lo) // (1 << ZBITS)) + 1
    want = {i: _morton_ref([(v - lo) // step], ZBITS) for i, v in enumerate(vals)}
    for kwargs in ({"bounds": [(lo, hi)]}, {}):
        got = {
            r["id"]: r["zval"]
            for r in with_zvalue(df, ["a"], **kwargs).collect()
        }
        assert got == want, kwargs


def test_internal_name_collision_checked(spark):
    df = spark.createDataFrame([(1, 2)], "_q0 long, a long")
    with pytest.raises(ValueError, match="_q0"):
        with_zvalue(df, ["a"])
    df2 = spark.createDataFrame([(1, 2)], "zval long, a long")
    with pytest.raises(ValueError, match="zval"):
        with_zvalue(df2, ["a"])
