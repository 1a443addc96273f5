"""hash(url) partitioning with salt-based hot-domain skew mitigation.

North-rule requirement (SURVEY.md §4.3): AQE's skew handling only rewrites
skewed *joins/aggregations*; a skewed ``repartition`` feeding a
``mapInPandas`` kernel is invisible to it, so salting is explicit job-level
logic:

1. a cheap pre-pass aggregates ROW counts per domain — it scans the url
   column only. (Counting payload *bytes* would be more precise but
   ``length(html)`` forces reading the full binary column — a whole-corpus
   IO pass at 100 TB. Row count over a pruned scan is the right
   cost/precision trade; a deploy that keeps an ``n_bytes`` column at
   ingest can pass ``weight_col`` to weight by size for free.);
2. domains above ``hot_share`` of total weight (rows by default) get
   NSALT-way salt derived from hash(url) — deterministic, so per-url
   completeness is preserved (every url still lands on exactly one
   partition);
3. everything else salts to 0, keeping domain locality for the cold tail.

At 10^12 docs the pre-pass is a trivial aggregation; hot_domains is a tiny
driver-side list (broadcast into the expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["domain_of", "find_hot_domains", "salted_repartition"]

DEFAULT_NSALT = 16


def domain_of(url_col):
    """https://host/path → host (pure built-ins: stays in codegen)."""
    return F.parse_url(url_col, F.lit("HOST"))


def find_hot_domains(
    pages: DataFrame,
    hot_share: float = 0.05,
    max_hot: int = 64,
    weight_col: str | None = None,
) -> list[str]:
    """Domains holding more than ``hot_share`` of total weight.

    Weight = row count by default (url-only pruned scan — the 100 TB-safe
    choice); pass ``weight_col`` (e.g. a precomputed n_bytes column) to
    weight by payload size instead."""
    weight = (
        F.col(weight_col) if weight_col is not None else F.lit(1).cast("long")
    )
    stats = (
        pages.select(domain_of(F.col("url")).alias("domain"), weight.alias("w"))
        .groupBy("domain")
        .agg(F.sum("w").alias("w"))
    )
    total = stats.agg(F.sum("w")).first()[0] or 0
    if not total:
        return []
    rows = (
        stats.filter(F.col("w") > hot_share * total)
        .orderBy(F.desc("w"))
        .limit(max_hot)
        .collect()
    )
    return [r["domain"] for r in rows if r["domain"] is not None]


def salted_repartition(
    pages: DataFrame,
    num_partitions: int,
    hot_domains: list[str] | None = None,
    nsalt: int = DEFAULT_NSALT,
) -> DataFrame:
    """Repartition by hash(domain, salt): cold domains stay co-located
    (salt 0); hot domains spread over ``nsalt`` buckets keyed by hash(url)
    so one domain can't pin a partition. Deterministic in the data only —
    output is independent of input partitioning (north-rule determinism)."""
    if not hot_domains:
        return pages.repartition(num_partitions, F.hash(F.col("url")))
    domain = domain_of(F.col("url"))
    salt = F.when(
        domain.isin(list(hot_domains)), F.pmod(F.hash(F.col("url")), F.lit(nsalt))
    ).otherwise(F.lit(0))
    return pages.repartition(num_partitions, F.hash(domain, salt))
