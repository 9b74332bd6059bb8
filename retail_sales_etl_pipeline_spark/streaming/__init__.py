from .dedup import (
    dedup_stream_against_index,
    dedup_stream_within_watermark,
    fingerprint_events,
)
from .events import (
    read_events_stream,
    run_to_memory,
    sessionized_counts,
    stream_stream_attribution,
    windowed_event_counts,
)
from .heavy_hitters import (
    MgRollup,
    read_documents_stream,
    verified_heavy_hitters,
)
from .kll_rollup import (
    KllRollup,
    certify_against_exact,
    one_shot_sketch,
    sketches_identical,
)
from .scoring import dsir_score_stream, export_dsir_model
from .sinks import exactly_once_parquet_sink, run_with_exactly_once_sink

__all__ = [
    "KllRollup",
    "MgRollup",
    "certify_against_exact",
    "dedup_stream_against_index",
    "dedup_stream_within_watermark",
    "dsir_score_stream",
    "exactly_once_parquet_sink",
    "export_dsir_model",
    "fingerprint_events",
    "one_shot_sketch",
    "read_documents_stream",
    "read_events_stream",
    "run_to_memory",
    "run_with_exactly_once_sink",
    "sessionized_counts",
    "sketches_identical",
    "stream_stream_attribution",
    "verified_heavy_hitters",
    "windowed_event_counts",
]
