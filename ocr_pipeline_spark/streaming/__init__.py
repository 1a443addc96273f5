"""Structured Streaming surface: the reference's batching/trigger
machinery (message_queue/, SURVEY.md §2.8) re-expressed as Spark
streaming primitives."""

from .stream_extract import (
    read_pages_stream,
    start_curate_stream,
    start_extract_stream,
    stream_curate,
    stream_dedup,
    stream_window_counts,
)
from .bucket_state import bucket_batch
from .listener import ThroughputListener
from .stream_sketch import (
    compact_sketch_log,
    read_sketch,
    start_token_sketch_stream,
)

__all__ = [
    "ThroughputListener",
    "compact_sketch_log",
    "read_pages_stream",
    "read_sketch",
    "start_curate_stream",
    "start_extract_stream",
    "start_token_sketch_stream",
    "stream_curate",
    "stream_dedup",
    "stream_window_counts",
    "bucket_batch",
]
