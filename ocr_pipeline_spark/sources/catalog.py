"""Table-format facade: Iceberg when the runtime is on the classpath,
parquet emulation otherwise.

The north rule targets Iceberg tables (atomic snapshot commits, partition
pruning via table metadata, one transaction for output + manifest). This
sandbox has no iceberg-spark-runtime jar and no network, so the facade
degrades to the parquet emulation the lineage layer documents
(ocr_pipeline_spark/operators/lineage.py): output written first,
manifest last — write-ahead in the safe direction — with dynamic
partition overwrite standing in for snapshot-level idempotence.

On a real deployment, enable Iceberg by launching with:

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=<warehouse-uri>

and pass table identifiers like ``lake.db.pages`` instead of paths —
``read_table``/``write_table`` dispatch on whether the target parses as a
catalog identifier with an Iceberg catalog configured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameWriter, SparkSession

__all__ = ["iceberg_available", "read_table", "write_table"]

_FORMAT = "iceberg"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _is_catalog_ident(spark: SparkSession, target: str) -> bool:
    if "/" in target or target.startswith("file:"):
        return False
    head = target.split(".", 1)[0]
    return (
        spark.conf.get(f"spark.sql.catalog.{head}", None) is not None
        and iceberg_available(spark)
    )


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """Scan ``target``: Iceberg table identifier or parquet path."""
    if _is_catalog_ident(spark, target):
        return spark.read.format(_FORMAT).load(target)
    return spark.read.parquet(target)


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Commit ``df`` to ``target``. Iceberg: atomic snapshot append/
    overwrite. Parquet: plain write (callers needing idempotent re-runs
    use dynamic partition overwrite, see lineage.py)."""
    spark = df.sparkSession
    writer: DataFrameWriter = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if _is_catalog_ident(spark, target):
        writer.format(_FORMAT).saveAsTable(target)
    else:
        writer.parquet(target)
