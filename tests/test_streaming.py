"""Streaming = batch: drive the streaming plans over the full backlog
(availableNow) and require exact agreement with the batch queries, plus a
watermark late-data test."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.sources import load_table
from retail_sales_etl_pipeline_spark.streaming import (
    read_events_stream,
    run_to_memory,
    sessionized_counts,
    windowed_event_counts,
)

from .conftest import SMOKE_SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Streamable copy of the events table (µs timestamps — the raw
    testdata parquet carries nanos, which streaming file sources reject)."""
    d = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_table(spark, SMOKE_SF_DIR, "events").write.parquet(d)
    return d


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_windowed_counts_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_to_memory(windowed_event_counts(stream), "win_counts")

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("value_micros"),
        )
        .select(F.col("window.start").alias("window_start"), "event_type", "n", "value_micros")
    )
    assert _canon(got) == _canon(batch)


def test_sliding_window_counts(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_to_memory(
        windowed_event_counts(stream, window="2 hours", slide="1 hour"),
        "slide_counts",
    )
    rows = got.collect()
    assert rows
    # every event lands in exactly 2 sliding windows -> total n doubles
    n_events = spark.read.parquet(events_dir).count()
    assert sum(r["n"] for r in rows) == 2 * n_events


def test_session_stream_equals_batch_session_window(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=4)
    got = run_to_memory(sessionized_counts(stream), "sess_counts")

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("session_window.start").alias("session_start"), "user_id", "n_events")
    )
    assert _canon(got) == _canon(batch)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode + watermark across a restart: a row older than the
    persisted watermark horizon arriving later must be dropped — the
    finalized window never re-emits or changes."""
    src = str(tmp_path / "late_events")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )

    def run_once():
        stream = read_events_stream(spark, src)
        agg = windowed_event_counts(stream, window="1 hour", watermark="1 hour")
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    base = spark.createDataFrame(
        [
            (1, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 13:00:00", 1, "click", 1.0, "{}"),
        ],
        schema,
    ).withColumn("ts", F.to_timestamp("ts"))
    base.coalesce(1).write.mode("append").parquet(src)
    run_once()  # advances the persisted watermark to 12:00

    late = spark.createDataFrame(
        [(3, "2024-01-01 10:10:00", 1, "click", 1.0, "{}")], schema
    ).withColumn("ts", F.to_timestamp("ts"))
    late.coalesce(1).write.mode("append").parquet(src)
    run_once()  # late row is below the watermark -> dropped

    out = spark.read.parquet(sink)
    emitted = [(str(r["window_start"]), r["n"]) for r in out.collect()]
    # exactly one emission of the finalized 10:00 window, with n=1 (the
    # late row never counted); the 13:00 window stays open (no emission).
    assert emitted == [("2024-01-01 10:00:00", 1)]
