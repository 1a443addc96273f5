"""SparkSession factory with scale-oriented defaults.

Tuned for the 100 TB design point (SURVEY.md §4.2/§4.3) while running on
local[N] here:
- AQE on (post-shuffle coalescing + skew-join splitting);
- Arrow everywhere; ``maxRecordsPerBatch`` is the rebuilt analogue of the
  reference's GPU batch cap of 350 regions (README.md:84-88) — it bounds
  how many pages one Python-worker batch holds so a batch of max-size
  payloads stays well under executor memory;
- shuffle partitions sized to cores (local) — on a real cluster this is
  set to ~2-3× total cores and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "ARROW_MAX_RECORDS_PER_BATCH"]

# ~350-region GPU cap analogue (README.md:84-88): pages per Arrow batch.
# 128 pages × ~64 KiB average payload ≈ 8 MiB per batch per worker.
# Measured on the extraction kernel (bench.py --scaling grid): 128 beats
# 64/256/1024 — small enough that the JVM scan pipelines with Python
# kernel compute, large enough to amortize the worker round trip.
ARROW_MAX_RECORDS_PER_BATCH = 128


def get_spark(
    app_name: str = "ocr_pipeline_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
