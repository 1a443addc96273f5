"""Model-based quality scorer: separation property, exact fixed-point
invariants, partition independence (cross-engine parity runs in
test_entry.py via qc_bucket_weights / qc_scores)."""

from __future__ import annotations

import pytest

from ocr_pipeline_spark.operators.classifier import (
    QC_SCALE,
    bucket_weights,
    quality_scores,
)

# 8 quality docs share a "good" vocabulary; 8 junk docs (fail the
# len/stop gates: no stopwords, too short after norm) share a "bad" one
GOOD = [
    "the quick brown fox and the lazy dog keep the garden in the sun",
    "a calm river runs by the old mill and the quiet stone bridge",
    "the baker sells warm bread and the cafe pours dark coffee daily",
    "a small boat drifts on the lake while the gulls circle above",
    "the library keeps rare maps and the archive holds old letters",
    "a long train rolls past the field and the farm by the hills",
    "the market opens early and the vendors stack ripe fruit high",
    "a light rain falls on the roof and the street shines below",
]
BAD = [
    "zxq wvk pfj",
    "qqq www eee",
    "jkl mno pqr",
    "zzz yyy xxx",
    "aaa bbb ccc",
    "ddd eee fff",
    "ggg hhh iii",
    "jjj kkk lll",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t) for i, t in enumerate(GOOD)] + [
        (100 + i, t) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weights_are_bounded_fixed_point(spark, corpus):
    for r in bucket_weights(corpus).collect():
        assert 0 <= r["n_quality"] <= r["n_total"]
        assert 0 <= r["weight"] <= QC_SCALE
        assert r["weight"] == (QC_SCALE * (r["n_quality"] + 1)) // (
            r["n_total"] + 2
        )


def test_scores_separate_distilled_labels(spark, corpus):
    rows = {r["doc_id"]: r for r in quality_scores(corpus).collect()}
    assert len(rows) == 16
    good = [rows[i] for i in range(8)]
    bad = [rows[100 + i] for i in range(8)]
    assert all(r["is_quality"] for r in good)
    assert not any(r["is_quality"] for r in bad)
    # the soft score must reproduce the separation: every good doc
    # outranks every bad doc on this cleanly-split vocabulary
    assert min(r["quality_score"] for r in good) > max(
        r["quality_score"] for r in bad
    )


def test_scores_partition_independent(spark, corpus):
    a = sorted(map(tuple, quality_scores(corpus.repartition(1)).collect()))
    b = sorted(map(tuple, quality_scores(corpus.repartition(5)).collect()))
    assert a == b


def test_scores_on_real_corpus_discriminate(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = quality_scores(docs).collect()
    assert len(rows) == docs.count()
    q = [r["quality_score"] for r in rows if r["is_quality"]]
    n = [r["quality_score"] for r in rows if not r["is_quality"]]
    assert q and n
    # distillation sanity: mean score of quality-labeled docs exceeds
    # the mean of the rest (weak but must hold for a working model)
    assert sum(q) / len(q) > sum(n) / len(n)


def test_top_fraction_selects_best_quarter(spark, corpus):
    from ocr_pipeline_spark.operators.classifier import (
        select_top_fraction,
    )

    top = select_top_fraction(corpus, frac=0.25).collect()
    assert len(top) == 4  # ceil(0.25 * 16)
    scores = {
        r["doc_id"]: r["quality_score"]
        for r in quality_scores(corpus).collect()
    }
    cutoff = sorted(scores.values(), reverse=True)[3]
    assert all(r["quality_score"] >= cutoff for r in top)
    assert all(r["doc_id"] < 100 for r in top)  # all from the GOOD half
    with pytest.raises(ValueError):
        select_top_fraction(corpus, frac=0.0)
