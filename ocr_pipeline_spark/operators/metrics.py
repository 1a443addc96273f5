"""Per-stage throughput metrics (north rule: docs/pages-per-second
logged per stage).

The reference hand-rolls timers/counters/resource snapshots in a
monitoring module (monitoring/monitoring.py:74-147) and serves them over
``/metrics`` endpoints (pipeline/app.py:96-105). Here the same signal
rides Spark accumulators: kernels add (rows, kernel-seconds) per Arrow
batch from inside the Python workers; the driver reads totals after the
action and logs one JSON line per stage.

Two rates are reported per stage:
- ``docs_per_kernel_cpu_sec``: rows / summed in-kernel seconds — the
  pure kernel cost, independent of cluster size (multiply by core count
  for capacity planning);
- the job-level wall docs/sec is the caller's to compute (wall time is
  driver-side; see bench.py / extract_job).

StageMetrics is picklable (it holds only accumulators), so one object
can instrument every stage of a job and travel into mapInPandas
closures.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

__all__ = ["StageMetrics"]


class StageMetrics:
    def __init__(self, spark: SparkSession, stages: tuple[str, ...] = ("extract",)):
        sc = spark.sparkContext
        self._rows = {s: sc.accumulator(0) for s in stages}
        self._secs = {s: sc.accumulator(0.0) for s in stages}

    def add(self, stage: str, n_rows: int, secs: float) -> None:
        """Called from inside kernels (executor side)."""
        self._rows[stage].add(n_rows)
        self._secs[stage].add(secs)

    def report(self) -> dict[str, dict[str, float]]:
        """Driver side, after an action: per-stage totals and rates."""
        out = {}
        for s in self._rows:
            rows = self._rows[s].value
            secs = self._secs[s].value
            out[s] = {
                "rows": rows,
                "kernel_cpu_secs": round(secs, 3),
                "docs_per_kernel_cpu_sec": round(rows / secs, 1) if secs else 0.0,
            }
        return out

    def log(self) -> dict[str, dict[str, float]]:
        """Print one JSON line per stage (the /metrics endpoint analogue,
        pipeline/app.py:96-105 — here a log line a cluster scraper reads)."""
        rep = self.report()
        for stage, m in rep.items():
            print(json.dumps({"stage": stage, **m}))
        return rep
