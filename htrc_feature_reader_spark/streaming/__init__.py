"""Structured Streaming faces of the batch temporal operators."""

from .asof import stream_asof_join
from .dedup import stream_exact_dedup
from .jsonl import route_good_and_quarantine, stream_jsonl
from .sessionize import stream_session_counts, stream_windowed_rollup
from .stateful import stream_forward_fill

__all__ = ["stream_asof_join", "stream_forward_fill", "stream_session_counts",
           "stream_windowed_rollup"]
