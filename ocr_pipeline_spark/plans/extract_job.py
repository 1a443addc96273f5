"""The flagship job: pages table → extracted table + lineage manifests.

Rebuild lifecycle (SURVEY.md §3.3), one job, one wide stage boundary:

    pages (scan; Catalyst prunes to url/html)
    → resume anti-join against committed manifest buckets
    → salted repartition on hash(domain, salt)     [the only shuffle]
    → mapInPandas fused extraction kernel          [Arrow-batched]
    → write extracted (bucket-partitioned) + manifest rows

Scale notes (100 TB / 10^12 docs):
- the shuffle moves only (url, html) — and would be skipped entirely if the
  input table is already bucketed by url (Iceberg bucket(url) partitioning);
  it exists to balance payload bytes across executors when it is not;
- nothing block-level ever shuffles; the fused kernel keeps fan-out/fan-in
  inside one Arrow batch;
- resume cost is one manifest-scan anti-join, independent of data size.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

import time

from ..operators.extraction import extract_pages
from ..operators.lineage import (
    committed_buckets,
    pending,
    with_bucket,
    write_extracted_with_manifest,
)
from ..operators.metrics import StageMetrics
from ..operators.partitioning import find_hot_domains, salted_repartition

__all__ = ["run_extraction"]


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    out_path: str,
    manifest_path: str,
    run_id: str | None = None,
    n_buckets: int = 64,
    num_partitions: int | None = None,
    salting: bool = True,
    metrics: StageMetrics | None = None,
) -> str:
    """Run (or resume) the extraction job. Returns the run_id.

    Logs per-stage docs/sec (north rule): kernel-cpu rate via
    accumulators plus job wall docs/sec."""
    run_id = run_id or uuid.uuid4().hex
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    metrics = metrics or StageMetrics(spark, stages=("extract",))

    todo = pending(
        with_bucket(pages, n_buckets), committed_buckets(spark, manifest_path)
    )
    # cheap pre-pass on the input side (url column only — html pruned):
    # which buckets does this run own? Drives the manifest read-back filter.
    run_buckets = [r["bucket"] for r in todo.select("bucket").distinct().collect()]
    hot = find_hot_domains(todo) if salting else []
    balanced = salted_repartition(todo, num_partitions, hot)
    extracted = with_bucket(extract_pages(balanced, metrics=metrics), n_buckets)
    t0 = time.monotonic()
    write_extracted_with_manifest(
        extracted, out_path, manifest_path, run_id, run_buckets=run_buckets
    )
    wall = time.monotonic() - t0
    rep = metrics.log()
    n_docs = rep.get("extract", {}).get("rows", 0)
    print(
        '{"stage": "job", "rows": %d, "wall_secs": %.3f, "docs_per_sec": %.1f}'
        % (n_docs, wall, n_docs / wall if wall else 0.0)
    )
    return run_id
