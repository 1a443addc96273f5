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
