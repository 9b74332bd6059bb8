from .events import (
    read_events_stream,
    run_to_memory,
    sessionized_counts,
    stream_stream_attribution,
    windowed_event_counts,
)
from .sinks import exactly_once_parquet_sink, run_with_exactly_once_sink

__all__ = [
    "exactly_once_parquet_sink",
    "read_events_stream",
    "run_to_memory",
    "run_with_exactly_once_sink",
    "sessionized_counts",
    "stream_stream_attribution",
    "windowed_event_counts",
]
