"""Catalog facade: parquet fallback round-trip + Iceberg detection."""

from __future__ import annotations

from ocr_pipeline_spark.sources.catalog import (
    iceberg_available,
    read_table,
    write_table,
)


def test_iceberg_detection_is_boolean(spark):
    # no iceberg runtime in this container — must degrade, not raise
    assert iceberg_available(spark) is False


def test_parquet_fallback_roundtrip(spark, tmp_path):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "t")
    write_table(df, path, mode="overwrite")
    assert read_table(spark, path).count() == 100


def test_partitioned_write(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(40)], "doc_id long, bucket int"
    )
    path = str(tmp_path / "p")
    write_table(df, path, mode="overwrite", partition_by=["bucket"])
    back = read_table(spark, path)
    assert back.count() == 40
    assert back.filter("bucket = 2").count() == 10


def test_upsert_parquet_replaces_and_appends(spark, tmp_path):
    from ocr_pipeline_spark.sources.catalog import upsert_table

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    base.write.parquet(path)
    ups = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "id long, v string"
    )
    upsert_table(spark, ups, path, ["id"])
    got = {
        r["id"]: r["v"] for r in spark.read.parquet(path).collect()
    }
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}
    # idempotent: re-applying the same updates changes nothing
    upsert_table(spark, ups, path, ["id"])
    again = {
        r["id"]: r["v"] for r in spark.read.parquet(path).collect()
    }
    assert again == got


def test_upsert_creates_missing_target_and_rejects_dupes(spark, tmp_path):
    import pytest

    from ocr_pipeline_spark.sources.catalog import upsert_table

    path = str(tmp_path / "fresh")
    ups = spark.createDataFrame([(1, "a")], "id long, v string")
    upsert_table(spark, ups, path, ["id"])
    assert spark.read.parquet(path).count() == 1
    dup = spark.createDataFrame(
        [(1, "x"), (1, "y")], "id long, v string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_table(spark, dup, path, ["id"])
    with pytest.raises(ValueError, match="key column"):
        upsert_table(spark, ups, path, [])


def test_write_bucketed_roundtrip(spark, tmp_path):
    from ocr_pipeline_spark.sources.catalog import write_bucketed

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "id long, v string"
    )
    write_bucketed(df, "bk_rt", "id", n_buckets=4)
    try:
        got = spark.table("bk_rt")
        assert got.count() == 50
        assert sorted(r["id"] for r in got.collect()) == list(range(50))
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_rt")


def test_write_bucketed_one_file_per_bucket(spark):
    import glob

    from ocr_pipeline_spark.sources.catalog import write_bucketed

    # many upstream partitions: without the repartition-before-bucketBy
    # rule this writes up to partitions x buckets files
    df = spark.range(0, 400).withColumnRenamed("id", "k").repartition(16)
    write_bucketed(df, "bk_files", "k", n_buckets=4)
    try:
        files = glob.glob("spark-warehouse/bk_files/*.parquet")
        assert len(files) == 4, files
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_files")
