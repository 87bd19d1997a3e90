from .events import (
    read_event_stream,
    run_streaming_tumbling_counts,
    sessionize_events,
    streaming_tumbling_counts,
)

__all__ = [
    "read_event_stream",
    "run_streaming_tumbling_counts",
    "sessionize_events",
    "streaming_tumbling_counts",
]
from .events import (  # noqa: E402,F401
    stateful_sessionize,
    stream_dedup,
    stream_publish,
    stream_stream_click_purchase_join,
)

__all__ += [
    "stateful_sessionize",
    "stream_dedup",
    "stream_publish",
    "stream_stream_click_purchase_join",
]

from .events import run_streaming_enriched_counts  # noqa: E402,F401

__all__ += ["run_streaming_enriched_counts"]
from .events import stream_latest_state  # noqa: E402,F401
from .events import run_streaming_window_topk  # noqa: E402,F401
from .events import stream_upsert  # noqa: E402,F401

__all__ += ["run_streaming_window_topk", "stream_latest_state", "stream_upsert"]
from .documents import stream_index_documents  # noqa: E402,F401

__all__ += ["stream_index_documents"]
from .vectors import stream_upsert_vectors  # noqa: E402,F401

__all__ += ["stream_upsert_vectors"]
