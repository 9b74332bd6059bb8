"""Streaming dedup — the streaming twin of the batch dedup ladder (q20+).

Batch exact dedup groups the full corpus by content fingerprint; a stream
cannot hold unbounded key state, so the streaming form is
``dropDuplicatesWithinWatermark``: the first arrival of each key is
emitted, duplicates arriving within the watermark delay of that first
arrival are dropped, and the key's state is freed once the watermark
passes — state stays bounded by (keys per watermark window), not by
stream lifetime.

The deterministic contract (pinned in tests/test_streaming_dedup.py):

- in-window duplicate  -> dropped (never emitted);
- input row whose event time is already below the watermark -> dropped
  (standard stateful-operator late-row semantics);
- duplicate arriving AFTER its key's state expired (event time above the
  watermark, but more than the delay after the first arrival) ->
  RE-EMITTED. This is the documented bounded-state tradeoff: streaming
  dedup is exact within the watermark and at-least-once beyond it; the
  batch ladder (q20) remains the exactness backstop for full-corpus
  dedup, exactly as in production pipelines (streaming dedup in front,
  periodic batch compaction behind).

Like every module here, event time is LTZ (watermarks require it) and
batch/stream agreement is asserted within one UTC-pinned session — see
read_events_stream for the NTZ/LTZ note.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CONTENT_COLS = ("user_id", "event_type", "value", "props")


def fingerprint_events(
    events: DataFrame, content_cols: tuple[str, ...] = DEFAULT_CONTENT_COLS
) -> DataFrame:
    """Stamp a content fingerprint column (sha256 over the content columns,
    NULL-safe via a reserved separator) — the streaming analogue of the
    batch ladder's poly-hash content_fp. Works on batch and streaming
    DataFrames alike (pure projection)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("<NULL>")) for c in content_cols]
    return events.withColumn("content_fp", F.sha2(F.concat_ws("\x1f", *parts), 256))


def dedup_stream_within_watermark(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("content_fp",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins streaming dedup on ``key_cols`` with state
    bounded by the watermark (see module docstring for the exact
    drop/re-emit contract)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
