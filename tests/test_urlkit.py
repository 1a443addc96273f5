"""URL canonicalization: rewrite rules, idempotence, DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest

from ocr_pipeline_spark.operators.urlkit import (
    CANON_STEPS_SQL,
    EDGE_URLS,
    canonical_url,
)
from pyspark.sql import functions as F

CASES = [
    ("HTTPS://Example.COM/Path/Page", "https://example.com/Path/Page"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a?q=1", "https://example.com/a?q=1"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?", "https://example.com/a"),
    ("https://example.com/dir/index.html", "https://example.com/dir"),
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com/a?x=1&y=2", "https://example.com/a?x=1&y=2"),
    # review regressions: path-internal ':80', non-default port on the
    # wrong scheme, and the one-pass '/index.html/' shape
    ("https://example.com/story:80/page", "https://example.com/story:80/page"),
    ("http://example.com:443/a", "http://example.com:443/a"),
    ("https://example.com/a/index.html/", "https://example.com/a"),
    ("http://example.com:80/a:80/b", "http://example.com/a:80/b"),
]


def test_edge_urls_in_sync():
    # EDGE_URLS (the driver-oracle input corpus) must stay exactly the
    # CASES inputs whose expected canonical forms this file pins.
    assert [u for u, _ in CASES] == EDGE_URLS


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame([(u,) for u, _ in CASES], "url string")


def test_canonical_rules(spark, urls_df):
    got = [
        r["c"]
        for r in urls_df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_canonicalization_idempotent(spark, urls_df):
    once = urls_df.select(canonical_url(F.col("url")).alias("url"))
    twice = once.select(canonical_url(F.col("url")).alias("url"))
    assert once.collect() == twice.collect()


def test_duckdb_parity(spark, urls_df):
    s = [
        r["c"]
        for r in urls_df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u AS SELECT * FROM (VALUES "
        + ", ".join(f"('{u}')" for u, _ in CASES)
        + ") t(url)"
    )
    d = [r[0] for r in con.execute(f"SELECT {CANON_STEPS_SQL('url')} FROM u").fetchall()]
    assert s == d


def test_url_rule_verdicts_fixture_hits(spark):
    from ocr_pipeline_spark.operators.urlkit import (
        BLOCK_FIXTURE_URLS,
        BLOCK_RULES,
        url_rule_verdicts,
    )

    urls = spark.createDataFrame(
        [(u,) for u in BLOCK_FIXTURE_URLS], "url string"
    )
    rules = spark.createDataFrame(
        BLOCK_RULES, "domain string, path_prefix string, category string"
    )
    got = dict(
        (r["url"], r["category"])
        for r in url_rule_verdicts(urls, rules).collect()
    )
    assert got == {
        "https://cdn.ads.example/banner/1": "ads",
        "https://ads.example/x": "ads",
        "https://sub.site03.example/page/9": "blocklist",
        "https://site01.example/casino/slots": "gambling",
        "https://user:pw@tracker.example:8080/t?x=1#f": "tracking",
    }


def test_url_rule_verdicts_label_boundaries(spark):
    """Suffix matching is per dot-label: 'evilads.example' must NOT
    match the 'ads.example' rule (no substring false positives), and a
    bare-host url with no path matches domain-only rules."""
    from ocr_pipeline_spark.operators.urlkit import url_rule_verdicts

    urls = spark.createDataFrame(
        [
            ("https://evilads.example/x",),
            ("https://ads.example",),
            ("not a url at all",),
            ("https://site01.example/casinoroyale",),  # prefix DOES match
        ],
        "url string",
    )
    rules = spark.createDataFrame(
        [("ads.example", None, "ads"), ("site01.example", "/casino", "g")],
        "domain string, path_prefix string, category string",
    )
    got = dict(
        (r["url"], r["category"])
        for r in url_rule_verdicts(urls, rules).collect()
    )
    assert got == {
        "https://ads.example": "ads",
        "https://site01.example/casinoroyale": "g",
    }


def test_url_rule_verdicts_left_anti_composition(spark):
    """The documented caller pattern: pages left_anti hits keeps
    exactly the clean pages."""
    from ocr_pipeline_spark.operators.urlkit import (
        BLOCK_RULES,
        url_rule_verdicts,
    )

    pages = spark.createDataFrame(
        [
            ("https://site03.example/page/1", b"<p>x</p>"),
            ("https://siteok.example/page/2", b"<p>y</p>"),
        ],
        "url string, html binary",
    )
    rules = spark.createDataFrame(
        BLOCK_RULES, "domain string, path_prefix string, category string"
    )
    hits = url_rule_verdicts(pages, rules)
    kept = pages.join(hits, "url", "left_anti").collect()
    assert [r["url"] for r in kept] == ["https://siteok.example/page/2"]


def test_url_dedup_collapses_canonical_aliases(spark):
    from ocr_pipeline_spark.operators.urlkit import url_dedup

    urls = [
        "HTTPS://Example.COM/a",        # case
        "https://example.com:443/a",    # default port
        "https://example.com/a?",       # bare ?
        "https://example.com/a#frag",   # fragment
        "https://example.com/b",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["canonical_url"]: (r["n_urls"], r["kept_url"])
        for r in url_dedup(df).collect()
    }
    assert got == {
        "https://example.com/a": (4, "HTTPS://Example.COM/a"),
        "https://example.com/b": (1, "https://example.com/b"),
    }


def test_url_dedup_left_semi_composition(spark):
    from ocr_pipeline_spark.operators.urlkit import url_dedup

    pages = spark.createDataFrame(
        [
            ("https://example.com/a", b"x"),
            ("https://example.com/a?", b"y"),
            ("https://example.com/b", b"z"),
        ],
        "url string, html binary",
    )
    kept = pages.join(
        url_dedup(pages).select(F.col("kept_url").alias("url")),
        "url",
        "left_semi",
    )
    assert sorted(r["url"] for r in kept.collect()) == [
        "https://example.com/a",
        "https://example.com/b",
    ]
