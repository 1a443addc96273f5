"""Unit tests for bigram collocation mining
(operators/collocations.py). Cross-engine value parity lives in
test_entry.py (ts_collocations oracle); these check the lift math
against a pure-Python replay and the adjacency semantics.
"""

from __future__ import annotations

import pytest

from ocr_pipeline_spark.operators.collocations import collocations

DOCS = [
    (0, "new york is big and new york is old"),
    (1, "new york new york"),
    (2, "a new day in york"),
    (3, "is is is and and"),
    (4, None),
    (5, ""),
]


def _py_collocations(rows, min_count=2):
    toks = {
        i: " ".join(t.lower().split()).split(" ")
        for i, t in rows
        if t and t.strip()
    }
    uni: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
    n = sum(uni.values())
    bg: dict[tuple[str, str], int] = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    out = []
    for (a, b), c_ab in bg.items():
        if c_ab < min_count:
            continue
        lift = (10000 * c_ab * n) // (uni[a] * uni[b])
        out.append((a, b, c_ab, uni[a], uni[b], lift))
    out.sort(key=lambda r: (-r[5], r[0], r[1]))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_python_spec(spark, docs):
    want = _py_collocations(DOCS, min_count=2)
    got = [
        tuple(r)
        for r in collocations(docs, min_count=2, top_k=100).collect()
    ]
    assert got == want


def test_collocation_outranks_chance_pair(spark, docs):
    got = {
        (r["a"], r["b"]): r["lift_bp"]
        for r in collocations(docs, min_count=2, top_k=100).collect()
    }
    # "new york" is a true collocation; "is is" is a frequent-token
    # chance pair — lift must rank them apart (absolute 10000 baselines
    # need a large corpus; at 23 tokens only the ordering is meaningful)
    assert got[("new", "york")] == 2 * got[("is", "is")]
    assert got[("new", "york")] == max(got.values())


def test_bigrams_do_not_cross_documents(spark):
    # "x y" adjacency exists only within a doc: doc0 ends with x,
    # doc1 starts with y -> no (x, y) bigram
    df = spark.createDataFrame(
        [(0, "a a x"), (1, "y a a")], "doc_id long, text string"
    )
    pairs = {
        (r["a"], r["b"])
        for r in collocations(df, min_count=1, top_k=100).collect()
    }
    assert ("x", "y") not in pairs


def test_top_k_and_min_count(spark, docs):
    got = collocations(docs, min_count=2, top_k=2).collect()
    assert len(got) == 2
    assert all(r["c_ab"] >= 2 for r in got)
