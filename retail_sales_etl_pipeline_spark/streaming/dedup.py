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


def dedup_stream_against_index(
    stream: DataFrame,
    index: DataFrame,
    key_cols: tuple[str, ...] = ("content_fp",),
) -> DataFrame:
    """Stream-STATIC anti join: drop every stream row whose key already
    exists in a static (batch-built) index — the streaming form of
    incremental dedup against an existing corpus
    (plans.dedup_queries.dedup_increment_status), and the missing third
    join shape next to stream-stream (events.stream_stream_attribution)
    and batch-batch.

    The static side is re-read per micro-batch (Spark's stream-static
    contract), so an index parquet appended by a nightly batch compaction
    is picked up without restarting the query. At scale the anti join
    broadcasts the index when it fits, else shuffles hash keys only —
    never document bodies. Stateless: no watermark needed (unlike
    dropDuplicatesWithinWatermark there is no cross-batch stream state;
    within-stream duplicates are the within-watermark operator's job —
    compose both for the full incremental ladder)."""
    return stream.join(index.select(*key_cols), list(key_cols), "left_anti")
