"""Sources: deterministic synthetic pages table + parquet helpers.

The north rule's input is an Iceberg table of Common-Crawl-style pages
(url, warc_ts, html binary, text, lang). This container has no Iceberg
runtime jars, so tables are written/read as parquet with the identical
schema and the Iceberg-specific pieces (snapshot commit, manifest-based
resume) are modeled explicitly by ``operators.lineage`` — the DataFrame
code is unchanged when ``format("parquet")`` becomes ``format("iceberg")``.
"""

from .synth_pages import PAGES_SCHEMA, synth_pages, write_pages_parquet

__all__ = ["PAGES_SCHEMA", "synth_pages", "write_pages_parquet"]
