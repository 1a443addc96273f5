"""Regenerate golden extraction fixtures (FIXTURES.md §5).

Run manually after an intentional kernel-semantics change (and bump
ocr_pipeline_spark.EXTRACTOR_VERSION):

    python tests/gen_goldens.py

Goldens are produced by the pure-Python kernels run standalone — the same
code the Spark UDFs execute — so the pytest suite checks both (a) kernel
drift vs the checked-in goldens and (b) Spark-vs-kernel byte identity.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ocr_pipeline_spark import EXTRACTOR_VERSION
from ocr_pipeline_spark.kernels.extract import extract_document
from ocr_pipeline_spark.sources.synth_pages import synth_pages

GOLDEN_SEED = 7
GOLDEN_ROWS = 50
PATH = pathlib.Path(__file__).parent / "goldens" / "extraction_v1.json"


def build() -> dict:
    pages = synth_pages(GOLDEN_ROWS, seed=GOLDEN_SEED)
    docs = []
    for row in pages.itertuples():
        r = extract_document(row.html)
        docs.append(
            {
                "url": row.url,
                "kind": r.kind,
                "error": r.error,
                "text_sha256": r.text_sha256,
                "n_blocks": r.n_blocks,
                "content_spans": [
                    [b.block_idx, b.span_start, b.span_end]
                    for b, keep in zip(r.blocks, r.flags)
                    if keep
                ],
            }
        )
    return {
        "extractor_version": EXTRACTOR_VERSION,
        "seed": GOLDEN_SEED,
        "rows": GOLDEN_ROWS,
        "docs": docs,
    }


if __name__ == "__main__":
    PATH.parent.mkdir(exist_ok=True)
    PATH.write_text(json.dumps(build(), indent=1))
    print(f"wrote {PATH}")
