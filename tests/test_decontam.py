"""Benchmark-decontamination operator tests (cross-engine parity lives
in test_entry.py's oracle harness via the ct_contamination query)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_pipeline_spark.operators.decontam import contamination_flags

LEAKED = (
    "the mitochondria is the powerhouse of the cell and converts "
    "nutrients into chemical energy for the organism"
)
CLEAN = (
    "spark partitions shuffle data between executors when wide "
    "transformations require rows with matching keys to colocate"
)


def test_flags_docs_containing_benchmark_grams(spark):
    docs = spark.createDataFrame(
        [
            (0, f"intro text then {LEAKED} and some trailing words here"),
            (1, CLEAN),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(LEAKED,)], "text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in contamination_flags(docs, bench, threshold_pct=10).collect()
    }
    assert got[0]["n_hit"] > 0 and got[0]["is_contaminated"]
    assert got[1]["n_hit"] == 0 and not got[1]["is_contaminated"]
    # every doc appears exactly once, hits never exceed totals
    assert set(got) == {0, 1}
    assert all(r["n_hit"] <= r["n_grams"] for r in got.values())


def test_short_doc_whole_text_fallback(spark):
    # < n words: the whole normalized text is the single gram, so an
    # exact short benchmark item still matches (and only exactly)
    docs = spark.createDataFrame(
        [(0, "What  Is THE Capital"), (1, "what is a capital")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("what is the capital",)], "text string")
    got = {
        r["doc_id"]: r["is_contaminated"]
        for r in contamination_flags(docs, bench).collect()
    }
    assert got == {0: True, 1: False}


def test_threshold_is_integer_exact(spark):
    # 30 tokens -> 23 distinct 8-grams; a benchmark covering exactly one
    # gram: 100*1 >= pct*23 iff pct <= 4
    words = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame([(0, words)], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(" ".join(f"w{i}" for i in range(8)),)], "text string"
    )
    lo = contamination_flags(docs, bench, threshold_pct=4).collect()[0]
    hi = contamination_flags(docs, bench, threshold_pct=5).collect()[0]
    assert lo["n_grams"] == 23 and lo["n_hit"] == 1
    assert lo["is_contaminated"] and not hi["is_contaminated"]


def test_null_text_defined(spark):
    docs = spark.createDataFrame([(0, None)], "doc_id long, text string")
    bench = spark.createDataFrame([("anything at all",)], "text string")
    r = contamination_flags(docs, bench).collect()[0]
    assert (r["n_grams"], r["n_hit"], r["is_contaminated"]) == (1, 0, False)


def test_fuzzy_decontam_flags_planted_copies(spark):
    from pyspark.sql import functions as F

    from ocr_pipeline_spark.operators.decontam import fuzzy_decontam

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    out = fuzzy_decontam(docs, bench)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 500            # one row per corpus doc, always
    # every planted literal copy self-matches at exactly 10000 bp
    for did, r in rows.items():
        if did % 10 == 0:
            assert r["best_jaccard_bp"] == 10000 and r["fuzzy_contaminated"], did
    # clean docs report the documented zero triple
    clean = [r for r in rows.values() if r["n_bench_candidates"] == 0]
    assert clean and all(
        r["best_jaccard_bp"] == 0 and not r["fuzzy_contaminated"]
        for r in clean
    )


def test_fuzzy_decontam_misses_nothing_lsh_recalls(spark):
    """A lightly-edited benchmark item (one token changed out of 30)
    must still be caught — the fuzzy screen's reason to exist; and a
    completely unrelated doc must not be."""
    from ocr_pipeline_spark.operators.decontam import fuzzy_decontam

    base = " ".join(f"tok{i}" for i in range(30))
    edited = base.replace("tok7", "changed")
    rows = [(1, edited), (2, "entirely different words " * 5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(10_000_000, base)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["fuzzy_contaminated"], r["best_jaccard_bp"])
        for r in fuzzy_decontam(docs, bench).collect()
    }
    assert got[1][0] and got[1][1] >= 5000
    assert not got[2][0] and got[2][1] == 0
