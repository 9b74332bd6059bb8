from .events import (
    read_events_stream,
    run_to_memory,
    sessionized_counts,
    windowed_event_counts,
)

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "sessionized_counts",
    "windowed_event_counts",
]
