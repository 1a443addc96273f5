from __future__ import annotations

import pytest

from ocr_pipeline_spark.session import get_spark
from ocr_pipeline_spark.sources.synth_pages import synth_pages


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ocr_pipeline_spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_pdf():
    """Deterministic 200-row pages table (FIXTURES.md t_smoke)."""
    return synth_pages(200, seed=42)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf):
    from ocr_pipeline_spark.sources.synth_pages import PAGES_SCHEMA

    df = spark.createDataFrame(pages_pdf, schema=PAGES_SCHEMA)
    df.persist()
    df.count()
    return df
