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
from .events import stateful_sessionize, stream_publish  # noqa: E402,F401

__all__ += ["stateful_sessionize", "stream_publish"]
