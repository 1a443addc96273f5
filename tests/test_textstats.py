"""Functional text-stats tests (cross-engine parity lives in
test_entry.py's oracle harness; these prove the heuristics behave on
real-ish text)."""

from __future__ import annotations

import pytest

from ocr_pipeline_spark.operators.textstats import (
    LANG_STOPWORDS,
    lang_id_multi,
)

SAMPLES = [
    (0, "en", "the cat sat on the mat and it was not at all happy about "
              "this because the dog would not go away from the door"),
    (1, "de", "der hund ist nicht im haus und die katze sitzt auf dem "
              "dach mit einer taube die nur noch schlafen will"),
    (2, "es", "el perro no está en la casa y el gato se sienta en el "
              "tejado con una paloma que no quiere hacer nada más"),
    (3, "fr", "le chien est dans la maison et le chat est sur le toit "
              "avec une colombe qui ne veut pas faire plus que dormir"),
    (4, "unknown", "zzz qqq xxx vvv kkk www yyy nnn mmm ppp rrr ttt"),
]


@pytest.fixture(scope="module")
def sample_docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, _, t in SAMPLES], "doc_id long, text string"
    )


def test_lang_id_multi_guesses(spark, sample_docs):
    got = {
        r["doc_id"]: r["lang_guess"]
        for r in lang_id_multi(sample_docs).collect()
    }
    assert got == {i: lang for i, lang, _ in SAMPLES}


def test_lang_id_multi_integer_evidence(spark, sample_docs):
    row = lang_id_multi(sample_docs).filter("doc_id = 1").first()
    assert row["de_hits"] > row["en_hits"]
    assert row["n_tokens"] > 0
    # evidence columns are exact integers (cross-engine recipe)
    for lg in LANG_STOPWORDS:
        assert isinstance(row[f"{lg}_hits"], int)


def test_stopword_lists_are_normalized():
    # membership is tested against normalized (lowercased) tokens — the
    # lists must already be in that form, and non-trivially sized
    for lg, words in LANG_STOPWORDS.items():
        assert words == [w.lower() for w in words], lg
        assert len(words) >= 30, lg
        assert len(set(words)) == len(words), lg
