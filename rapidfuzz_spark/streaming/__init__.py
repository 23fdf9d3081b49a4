"""Structured Streaming operators beyond the foreachBatch linkage path
(pipeline/incremental.py): native session-window aggregation with
watermarked state eviction, and a custom stateful operator built on
applyInPandasWithState. Batch shapes of both run under the driver's SQL
value oracle; the streaming shapes are exercised by tests/test_streaming.
"""

from .decontam import collect_eval_grams, stream_decontaminate
from .neardup import stream_neardup
from .sessions import native_sessions
from .stateful import first_touch_stream, streaming_dedup

__all__ = [
    "native_sessions",
    "first_touch_stream",
    "streaming_dedup",
    "stream_neardup",
    "collect_eval_grams",
    "stream_decontaminate",
]
