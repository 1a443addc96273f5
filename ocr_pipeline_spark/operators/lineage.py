"""Per-partition lineage manifests + checkpoint resume (north rule).

Replaces the reference's durability story (persistent RabbitMQ delivery,
message_queue/rabbitmq/queue.py:40-66 — dead code in practice) with the
model Iceberg provides: atomic snapshot commits + a manifest table that
records what was processed, so a failed run resumes by skipping committed
work.

Unit of resume: a deterministic *bucket* of urls, ``pmod(xxhash64(url),
n_buckets)`` — stable across runs and cluster sizes (task partition ids are
NOT stable, so they are recorded for observability but never used as the
resume key). A run writes, per bucket:

    bucket int, run_id string, row_count long, n_errors long,
    bytes_hash string (xor-fold of per-url sha256 — order-independent),
    committed_at timestamp

Resume = anti-join pending buckets against the manifest (SURVEY.md §4.3.2).
With Iceberg the output append + manifest append would share one
transaction; on plain parquet we emulate by writing output first, manifest
last (manifest row ⇒ bucket fully present — write-ahead in the safe
direction). Partial bucket output from a crashed run is overwritten by the
deterministic dynamic-partition overwrite of that bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "MANIFEST_SCHEMA",
    "diff_extractions",
    "with_bucket",
    "committed_buckets",
    "pending",
    "write_extracted_with_manifest",
]

MANIFEST_SCHEMA = (
    "bucket int, run_id string, row_count long, n_errors long, "
    "bytes_hash string, committed_at timestamp"
)


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )


def committed_buckets(spark: SparkSession, manifest_path: str) -> DataFrame:
    """Manifest rows of prior runs; empty DataFrame if none exist yet."""
    try:
        return spark.read.parquet(manifest_path).select("bucket").distinct()
    except Exception:  # first run: no manifest table
        return spark.createDataFrame([], "bucket int")


def pending(pages_bucketed: DataFrame, committed: DataFrame) -> DataFrame:
    """Anti-join resume: drop pages whose bucket already committed (J4)."""
    return pages_bucketed.join(committed, "bucket", "left_anti")


def _xor_fold_sha(col):
    """Order-independent 64-bit fold of per-url text sha256 — the bucket's
    bytes_hash is identical no matter how rows were partitioned/ordered."""
    return F.lpad(
        F.hex(
            F.expr(
                "aggregate(collect_list(conv(substring(text_sha256,1,15),16,10)),"
                " 0L, (acc, x) -> acc ^ cast(x as bigint))"
            )
        ),
        16,
        "0",
    )


def write_extracted_with_manifest(
    extracted_bucketed: DataFrame,
    out_path: str,
    manifest_path: str,
    run_id: str,
    run_buckets: list[int] | None = None,
    compact: bool = True,
) -> None:
    """Commit extracted rows + their lineage manifest, bucket-partitioned.

    partitionOverwriteMode=dynamic replaces only the buckets present in
    this run (idempotent re-run of a crashed bucket); with Iceberg this
    whole function is one ``append`` + one manifest ``append`` in a single
    transaction.

    The manifest is aggregated from the rows READ BACK from ``out_path``
    (restricted to ``run_buckets``, computed cheaply from the input side),
    not from ``extracted_bucketed``: referencing the un-materialized plan
    twice would run the whole extraction kernel a second time, and a
    manifest derived from committed bytes is the stronger integrity claim
    (it describes what is actually on disk).
    """
    spark = extracted_bucketed.sparkSession
    if run_buckets is not None and not run_buckets:
        return  # nothing pending (fully-resumed or empty input): no-op
    if compact:
        # small-files control: partitionBy writes one file per
        # (task, bucket) pair — from P salted tasks that is up to
        # P × buckets shards per run. Repartitioning on bucket first
        # yields ONE file per bucket per run; the shuffle moves extracted
        # text (~10× smaller than the page payloads that already moved).
        extracted_bucketed = extracted_bucketed.repartition(F.col("bucket"))
    # per-WRITE option, not spark.conf.set: a session-wide mutation
    # silently flips every later mode("overwrite")+partitionBy write in
    # the same session to partition-level semantics (it turned
    # compact_sketch_log's full-log replace into an append — the r5
    # suite-order bug)
    (
        extracted_bucketed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(out_path)
    )
    written = spark.read.parquet(out_path)
    if run_buckets is not None:
        written = written.filter(F.col("bucket").isin(run_buckets))
    manifest = (
        written.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "n_errors"
            ),
            _xor_fold_sha(None).alias("bytes_hash"),
        )
        .select(
            "bucket",
            F.lit(run_id).alias("run_id"),
            "row_count",
            "n_errors",
            "bytes_hash",
            F.current_timestamp().alias("committed_at"),
        )
    )
    manifest.write.mode("append").parquet(manifest_path)


def diff_extractions(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    hash_col: str = "text_sha256",
) -> DataFrame:
    """Run-to-run extraction diff — the operational check behind the
    byte-identity contract: before promoting a new EXTRACTOR_VERSION,
    compare its output against the previous run per document and
    quantify what changed (reference analogue: re-running /ocr and
    eyeballing result.txt; here it is one join).

    Output per key: status ∈ {'same','diff','only_old','only_new'} plus
    both hashes ('' sentinel, never NULL-mixed). Scale shape: a single
    full-outer equi-join on the key — rows are (key, 64-hex) shorts,
    extracted text itself never moves. Aggregate downstream
    (groupBy('status').count()) for the promotion gate.
    """
    # presence markers, NOT hash nullability: a run may legitimately
    # carry a NULL hash for a key (e.g. a failed extraction) — that key
    # is still PRESENT, and pairing it with the other run must be
    # 'diff', never 'only_*'. NULL hashes coalesce to '' before compare.
    o = old.select(
        F.col(key),
        F.coalesce(F.col(hash_col), F.lit("")).alias("old_sha"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key),
        F.coalesce(F.col(hash_col), F.lit("")).alias("new_sha"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, key, "full_outer")
    return j.select(
        key,
        F.coalesce("old_sha", F.lit("")).alias("old_sha"),
        F.coalesce("new_sha", F.lit("")).alias("new_sha"),
        F.when(F.col("_in_old").isNull(), "only_new")
        .when(F.col("_in_new").isNull(), "only_old")
        .when(F.col("old_sha") == F.col("new_sha"), "same")
        .otherwise("diff")
        .alias("status"),
    )
