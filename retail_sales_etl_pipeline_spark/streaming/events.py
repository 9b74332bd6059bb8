"""Structured Streaming operators over the events table.

The reference is pure batch (SURVEY §2.9) — this module is the planned
extension surface: the same windowed/sessionized aggregations as
plans/event_queries.py, expressed as streaming plans. Spark guarantees the
batch and streaming forms agree, and tests assert it: a file-source stream
driven to completion (availableNow) must produce exactly the batch result.

Production shape: readStream from a growing parquet/kafka source,
watermarked event-time windows (late data beyond the watermark is dropped
deterministically, state is bounded), foreachBatch for exactly-once sinks.
Locally the same code runs against a static parquet directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Schema of the events stream with ts at Spark-native µs precision (the
# testdata parquet carries nanos; see sources.testdata._load_events).
# LTZ by Spark REQUIREMENT: watermarks reject TIMESTAMP_NTZ event time
# ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]). The batch path keeps NTZ
# wall-clock timestamps for session-TZ-independent oracle parity; the
# streaming twin inherits the session zone — which is fine, because
# stream/batch equivalence is asserted within one session.
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of event parquet files.

    Streaming file sources require an explicit schema (no inference at
    start). ``maxFilesPerTrigger`` shapes micro-batches for tests.

    UTC-session dependency (load-bearing, not just a schema comment): the
    batch loaders write/carry event time as TIMESTAMP_NTZ wall-clock
    values, while this schema declares LTZ ``TimestampType`` because
    watermarks REQUIRE it. Reading NTZ-written parquet with an LTZ schema
    reinterprets the stored micros through ``spark.sql.session.timeZone``
    — identical to the batch values only because the session factory pins
    UTC. A session on any other zone would shift every streaming window
    boundary relative to batch. If this reader must run on a non-UTC
    session, derive ts by casting from the NTZ loader convention instead.
    """
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) event-time window counts
    with a watermark bounding state: windows older than (max event time -
    watermark) are finalized and their state dropped — the property that
    keeps an infinite stream's memory finite."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("value_micros"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "value_micros",
        )
    )


def sessionized_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap-sessionization via the native session_window operator
    (stateful: open sessions merge as events arrive, close when the
    watermark passes their gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def stream_stream_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same user's
    clicks in the trailing ``window`` — the streaming twin of the batch
    bin-and-refine range join (plans.event_queries.q53).

    Both sides carry watermarks and the join condition bounds event-time
    distance, which is what lets Spark expire join state: a buffered
    click can be dropped once the watermark passes ts + window, so state
    stays finite on an infinite stream. Without the time bound this join
    would be rejected (unbounded state).
    """
    p = purchases.select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", watermark)
    return p.join(
        c,
        F.expr(
            f"p_user_id = c_user_id AND c_ts < p_ts "
            f"AND c_ts > p_ts - interval {window}"
        ),
    ).select("p_event_id", "c_event_id", F.col("p_user_id").alias("user_id"))


def run_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming plan over all currently-available input and return
    the materialized result (memory sink). Test/dev harness: availableNow
    processes the full backlog in bounded micro-batches then stops."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
