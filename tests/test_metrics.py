"""StageMetrics: executor-side accumulation, driver-side rates, and the
extract_job integration (north-rule per-stage docs/sec logging)."""

from __future__ import annotations

import json

from ocr_pipeline_spark.operators.extraction import extract_pages
from ocr_pipeline_spark.operators.metrics import StageMetrics
from ocr_pipeline_spark.plans.extract_job import run_extraction


def test_metrics_counts_all_rows(spark, pages_df):
    m = StageMetrics(spark, stages=("extract",))
    n = extract_pages(pages_df, metrics=m).count()
    rep = m.report()
    assert rep["extract"]["rows"] == n == pages_df.count()
    assert rep["extract"]["kernel_cpu_secs"] > 0
    assert rep["extract"]["docs_per_kernel_cpu_sec"] > 0


def test_run_extraction_logs_job_line(spark, pages_df, tmp_path, capfd):
    run_extraction(
        spark,
        pages_df,
        str(tmp_path / "out"),
        str(tmp_path / "man"),
        n_buckets=8,
    )
    lines = [
        json.loads(line)
        for line in capfd.readouterr().out.splitlines()
        if line.startswith("{")
    ]
    stages = {rec["stage"]: rec for rec in lines}
    assert stages["extract"]["rows"] == pages_df.count()
    assert stages["job"]["docs_per_sec"] > 0
