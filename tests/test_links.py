"""Unit tests for anchor-link extraction: the pure kernel
(kernels/linkkit.py) against hand-built HTML, and the Spark operator
(operators/links.py) against the kernel run (kernel-is-spec). Driver
value parity lives in test_entry.py (x_links / g_pagerank_web).
"""

from __future__ import annotations

import pytest

from ocr_pipeline_spark.kernels.linkkit import extract_links, resolve_href


class TestKernel:
    def test_quoted_and_unquoted_hrefs(self):
        doc = (
            '<p><a href="/double">d</a>'
            "<a href='/single'>s</a>"
            "<a href=/unquoted>u</a>"
            "<a class='x' href=\"/later-attr\">l</a>"
            "<A HREF=\"/upper\">U</A></p>"
        )
        assert extract_links(doc) == [
            "/double",
            "/single",
            "/unquoted",
            "/later-attr",
            "/upper",
        ]

    def test_unquoted_selfclosing_keeps_slash(self):
        # htmlkit.py:298 precedent: the '/' belongs to the value
        assert extract_links("<a href=https://x/>") == ["https://x/"]

    def test_anchor_without_href_and_empty_doc(self):
        assert extract_links("<a name='top'>x</a>") == []
        assert extract_links("") == []
        assert extract_links(None) == []

    def test_resolve_scope(self):
        base = "https://site.example/page/3"
        assert resolve_href(base, "/a/b") == "https://site.example/a/b"
        assert resolve_href(base, "https://other.example/x") == (
            "https://other.example/x"
        )
        assert resolve_href(base, "//protocol-relative") is None
        assert resolve_href(base, "relative/path") is None
        assert resolve_href(base, "#frag") is None
        assert resolve_href(base, "mailto:a@b") is None
        assert resolve_href("not-a-url", "/x") is None


class TestOperator:
    @pytest.fixture(scope="class")
    def pages(self, spark):
        from ocr_pipeline_spark.sources.synth_pages import (
            PAGES_SCHEMA,
            synth_pages,
        )

        return spark.createDataFrame(
            synth_pages(80, seed=7), schema=PAGES_SCHEMA
        )

    def test_matches_kernel_run(self, spark, pages):
        from ocr_pipeline_spark.kernels.extract import (
            DEFAULT_MAX_PAYLOAD_BYTES,
        )
        from ocr_pipeline_spark.kernels.htmlkit import decode_payload
        from ocr_pipeline_spark.operators.links import link_rows
        from ocr_pipeline_spark.sources.synth_pages import synth_pages

        pdf = synth_pages(80, seed=7)
        want = []
        for url, payload in zip(pdf.url, pdf.html):
            if payload is None or len(payload) == 0:
                continue
            if payload[:5] == b"%PDF-":
                continue
            doc, _ = decode_payload(
                bytes(payload)[:DEFAULT_MAX_PAYLOAD_BYTES]
            )
            for i, href in enumerate(extract_links(doc)):
                want.append((url, i, href, resolve_href(url, href)))
        got = sorted(
            tuple(r) for r in link_rows(pages).collect()
        )
        assert got == sorted(want)

    def test_page_edges_feed_pagerank(self, spark, pages):
        from ocr_pipeline_spark.operators.graph import pagerank
        from ocr_pipeline_spark.operators.links import page_edges

        edges = page_edges(pages)
        assert edges.schema.simpleString() == (
            "struct<src:bigint,dst:bigint>"
        )
        ranks = pagerank(edges, n_iters=2)
        assert ranks.count() > 0
        # edge derivation is scan-local: no exchange before the
        # pagerank aggregations move bigints
        plan = edges._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
