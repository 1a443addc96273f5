"""Streaming surface tests (SURVEY.md §2.8 rebuild).

- availableNow extraction stream ≡ batch extraction (same kernel, same
  bytes) — the drain-trigger path B3;
- maxFilesPerTrigger bounds micro-batch size — the size-trigger path B5;
- bucket_batch stateful op reproduces STDBucket exact-slice +
  remainder-carry semantics (B2) with checkpointed state;
- windowed counts with watermark run identically in batch mode (B8).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from ocr_pipeline_spark.operators.extraction import extract_pages
from ocr_pipeline_spark.sources.synth_pages import PAGES_SCHEMA, synth_pages
from ocr_pipeline_spark.streaming import (
    bucket_batch,
    start_extract_stream,
    stream_dedup,
    stream_window_counts,
)


@pytest.fixture(scope="module")
def pages_src(spark, pages_pdf, tmp_path_factory):
    """Pages table written as 4 separate parquet files (4 stream arrivals)."""
    root = tmp_path_factory.mktemp("stream_src")
    n = len(pages_pdf)
    step = n // 4
    for i in range(4):
        chunk = pages_pdf.iloc[i * step : (i + 1) * step if i < 3 else n]
        spark.createDataFrame(chunk, schema=PAGES_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(str(root / "pages"))
    return str(root / "pages")


def _wait(query, timeout=120):
    query.awaitTermination(timeout)
    if query.isActive:
        query.stop()
        raise AssertionError("stream did not drain in time")


def test_available_now_matches_batch(spark, pages_src, tmp_path):
    out = str(tmp_path / "out")
    q = start_extract_stream(
        spark,
        pages_src,
        out,
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    _wait(q)
    streamed = spark.read.parquet(out).select("url", "text_sha256")
    batch = extract_pages(spark.read.parquet(pages_src)).select(
        "url", "text_sha256"
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_max_files_per_trigger_bounds_batches(spark, pages_src, tmp_path):
    """4 input files + maxFilesPerTrigger=1 → 4 micro-batches (B5)."""
    out = str(tmp_path / "out")
    q = start_extract_stream(
        spark,
        pages_src,
        out,
        checkpoint=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        available_now=True,
    )
    _wait(q)
    assert q.lastProgress["batchId"] >= 3  # batch ids 0..3
    n_in = spark.read.parquet(pages_src).count()
    assert spark.read.parquet(out).count() == n_in


def test_bucket_batch_exact_slice_and_remainder(spark, tmp_path):
    """25 items for key 'a', 7 for 'b', max_batch_size=10 → exactly two
    'size' batches for a (10+10, remainder 5 held in state), none for b —
    STDBucket.get_batch semantics (bucket.py:72-76)."""
    src = str(tmp_path / "src")
    rows = [("a", f"a{i:03d}") for i in range(25)] + [
        ("b", f"b{i:03d}") for i in range(7)
    ]
    spark.createDataFrame(rows, "key string, item string").coalesce(
        1
    ).write.parquet(src)
    stream = spark.readStream.schema("key string, item string").parquet(src)
    batches = bucket_batch(stream, max_batch_size=10, wait_timeout_ms=None)
    q = (
        batches.writeStream.format("memory")
        .queryName("bucket_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    got = {
        (r["key"], r["batch_seq"]): (r["items"], r["reason"])
        for r in spark.table("bucket_out").collect()
    }
    assert set(got) == {("a", 0), ("a", 1)}
    items0, reason0 = got[("a", 0)]
    items1, reason1 = got[("a", 1)]
    assert reason0 == reason1 == "size"
    # exact slices in arrival order, remainder (a020..a024) not emitted
    assert items0 == [f"a{i:03d}" for i in range(10)]
    assert items1 == [f"a{i:03d}" for i in range(10, 20)]


def test_bucket_batch_timeout_flushes_remainder(spark, tmp_path):
    """The time half of the hybrid trigger (B7): 7 items < max_batch_size
    sit in state until the processing-time timeout fires (via Spark's
    no-data micro-batches) and flush with reason='timeout'."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("a", f"a{i}") for i in range(7)], "key string, item string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("key string, item string").parquet(src)
    q = (
        bucket_batch(stream, max_batch_size=10, wait_timeout_ms=3000)
        .writeStream.format("memory")
        .queryName("bucket_timeout_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline and not rows:
            assert q.exception() is None, q.exception()
            rows = spark.table("bucket_timeout_out").collect()
            time.sleep(1)
    finally:
        q.stop()
    assert len(rows) == 1
    r = rows[0]
    assert r["reason"] == "timeout"
    assert r["items"] == [f"a{i}" for i in range(7)]


def test_stream_kill_resume_exactly_once(spark, pages_src, tmp_path):
    """Durability (the reference's dead RabbitMQ path, done right): stop
    the stream mid-backlog, restart from the same checkpoint — the final
    output holds every input url exactly once."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_extract_stream(
        spark, pages_src, out, ckpt, max_files_per_trigger=1
    )  # default trigger: continuous micro-batches
    # let at least one micro-batch commit, then kill mid-backlog
    deadline = time.time() + 60
    while time.time() < deadline and (q.lastProgress is None):
        time.sleep(0.5)
    q.stop()
    q2 = start_extract_stream(
        spark, pages_src, out, ckpt, max_files_per_trigger=1,
        available_now=True,
    )
    _wait(q2)
    got = spark.read.parquet(out)
    n_in = spark.read.parquet(pages_src).count()
    assert got.count() == n_in
    assert got.select("url").distinct().count() == n_in


def test_stream_dedup_drops_recrawls(spark, tmp_path):
    """Two stream arrivals carrying the same urls → one row per url in
    the sink (state-backed exact dedup within the watermark)."""
    import datetime

    src = str(tmp_path / "src")
    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    rows = [(f"https://d.example/{i}", ts, b"<p>x</p>", None, "en") for i in range(20)]
    from ocr_pipeline_spark.sources.synth_pages import PAGES_SCHEMA

    for _ in range(2):  # same urls written twice = recrawl
        spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    q = (
        stream_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    got = spark.table("dedup_out")
    assert got.count() == 20
    assert got.select("url").distinct().count() == 20


def test_stream_dedup_batch_mode(spark, pages_df):
    doubled = pages_df.unionByName(pages_df)
    assert stream_dedup(doubled).count() == pages_df.count()


def test_window_counts_batch_semantics(spark, pages_df):
    """Watermarked windowed agg runs in batch mode and totals match."""
    wc = stream_window_counts(pages_df, window="30 days", watermark="1 hour")
    total = wc.agg(F.sum("n_docs")).first()[0]
    assert total == pages_df.count()
    one = wc.first()
    assert one["window_end"] > one["window_start"]


def test_stream_curate_gates_and_dedups(spark, tmp_path):
    """Streaming curation: quality gate + watermark dedup in one query;
    the same definition in batch mode keeps the earliest row per
    fingerprint after identical gating."""
    import datetime

    from ocr_pipeline_spark.streaming import stream_curate

    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    good = (
        "the quick brown fox keeps the garden and the house in the sun "
        "while the dog sleeps by the door"
    )
    junk = "zxq wvk pfj"
    rows = [
        (1, ts, good, "en"),
        (2, ts + datetime.timedelta(minutes=1), good, "en"),  # dup
        (3, ts, junk, "en"),                                  # gated
        (4, ts, good + " extra words here", "en"),
    ]
    schema = "doc_id long, warc_ts timestamp, text string, lang string"
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream_curate(stream)
        .writeStream.format("memory")
        .queryName("curate_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    got = spark.table("curate_out")
    assert got.select("fingerprint").distinct().count() == got.count()
    assert got.count() == 2  # two distinct quality texts
    assert set(
        r["doc_id"] for r in got.collect()
    ) <= {1, 2, 4}

    # batch mode: deterministic earliest-ts winner per fingerprint
    batch = stream_curate(spark.createDataFrame(rows, schema))
    ids = sorted(r["doc_id"] for r in batch.collect())
    assert ids == [1, 4]


def test_start_curate_stream_end_to_end(spark, tmp_path):
    import datetime

    from ocr_pipeline_spark.streaming import start_curate_stream

    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    good = (
        "the quick brown fox keeps the garden and the house in the sun "
        "while the dog sleeps by the door"
    )
    rows = [(1, ts, good, "en"), (2, ts, good, "en"), (3, ts, "zz", "en")]
    schema = "doc_id long, warc_ts timestamp, text string, lang string"
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    q = start_curate_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        available_now=True,
    )
    _wait(q)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 1  # one quality fingerprint survives
    assert got.first()["doc_id"] in (1, 2)


def test_token_sketch_stream_merges_to_batch_sketch(spark, tmp_path):
    """Continuous CMS maintenance: the merged append-only state log
    equals the batch sketch over the same corpus EXACTLY (cellwise
    mergeability), and estimates answer from the merged state."""
    import datetime

    from ocr_pipeline_spark.operators.sketch import cms_estimate, cms_state
    from ocr_pipeline_spark.operators.textstats import tokens
    from ocr_pipeline_spark.streaming import (
        compact_sketch_log,
        read_sketch,
        start_token_sketch_stream,
    )
    from pyspark.sql import functions as F

    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        (i, ts, f"the data {'query ' * (i % 3)}engine row {i}", "en")
        for i in range(60)
    ]
    schema = "doc_id long, warc_ts timestamp, text string, lang string"
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(2).write.parquet(src)

    state = str(tmp_path / "state")
    q = start_token_sketch_stream(
        spark,
        src,
        state,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    _wait(q)

    merged = {
        (r["row_idx"], r["col_idx"]): r["cnt"]
        for r in read_sketch(spark, state).collect()
    }
    toks = (
        spark.createDataFrame(rows, schema)
        .select(F.explode_outer(tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok").isNotNull() & (F.col("tok") != ""))
    )
    want = {
        (r["row_idx"], r["col_idx"]): r["cnt"]
        for r in cms_state(toks, "tok").collect()
    }
    assert merged == want

    est = {
        r["value"]: r["est"]
        for r in cms_estimate(
            read_sketch(spark, state), ["the", "zzz-absent"]
        ).collect()
    }
    assert est["the"] >= 60 and est["zzz-absent"] == 0

    # compaction preserves the sums
    compact_sketch_log(spark, state)
    after = {
        (r["row_idx"], r["col_idx"]): r["cnt"]
        for r in read_sketch(spark, state).collect()
    }
    assert after == want


def test_sketch_log_multi_writer_and_restart(spark, tmp_path):
    """Two writers share one state_dir without clobbering (their epoch
    ids both start at 0 — only the per-writer run_id keeps the
    partitions disjoint), and a fresh-checkpoint restart after
    compaction APPENDS to the compacted history instead of overwriting
    batch=0 (the r4 advisory's failure mode)."""
    import datetime

    from ocr_pipeline_spark.operators.sketch import cms_state
    from ocr_pipeline_spark.operators.textstats import tokens
    from ocr_pipeline_spark.streaming import (
        compact_sketch_log,
        read_sketch,
        start_token_sketch_stream,
    )
    from pyspark.sql import functions as F

    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    schema = "doc_id long, warc_ts timestamp, text string, lang string"
    rows_a = [(i, ts, f"alpha data {i}", "en") for i in range(20)]
    rows_b = [(i, ts, f"beta data {i}", "en") for i in range(30)]
    src_a, src_b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(src_a)
    spark.createDataFrame(rows_b, schema).coalesce(1).write.parquet(src_b)
    state = str(tmp_path / "state")

    def _expect(rowsets):
        toks = (
            spark.createDataFrame(
                [r for rs in rowsets for r in rs], schema
            )
            .select(F.explode_outer(tokens(F.col("text"))).alias("tok"))
            .filter(F.col("tok").isNotNull() & (F.col("tok") != ""))
        )
        return {
            (r["row_idx"], r["col_idx"]): r["cnt"]
            for r in cms_state(toks, "tok").collect()
        }

    # two writers, same state_dir, distinct run ids — both epoch 0
    for run_id, src in (("wa", src_a), ("wb", src_b)):
        _wait(
            start_token_sketch_stream(
                spark, src, state, str(tmp_path / f"ckpt_{run_id}"),
                available_now=True, run_id=run_id,
            )
        )
    got = {
        (r["row_idx"], r["col_idx"]): r["cnt"]
        for r in read_sketch(spark, state).collect()
    }
    assert got == _expect([rows_a, rows_b])

    # compact, then a THIRD writer with a fresh checkpoint (epoch 0
    # again) — history survives because 'compacted' is unreachable
    compact_sketch_log(spark, state)
    rows_c = [(i, ts, f"gamma data {i}", "en") for i in range(10)]
    src_c = str(tmp_path / "c")
    spark.createDataFrame(rows_c, schema).coalesce(1).write.parquet(src_c)
    _wait(
        start_token_sketch_stream(
            spark, src_c, state, str(tmp_path / "ckpt_wc"),
            available_now=True, run_id="wc",
        )
    )
    got = {
        (r["row_idx"], r["col_idx"]): r["cnt"]
        for r in read_sketch(spark, state).collect()
    }
    assert got == _expect([rows_a, rows_b, rows_c])

    # reserved / malformed run ids refuse loudly
    import pytest as _pytest

    for bad in ("compacted", "has-dash", "a=b", ""):
        with _pytest.raises(ValueError, match="run_id"):
            start_token_sketch_stream(
                spark, src_c, state, str(tmp_path / "ckpt_bad"),
                available_now=True, run_id=bad,
            )
