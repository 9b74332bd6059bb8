"""Streaming = batch: drive the streaming plans over the full backlog
(availableNow) and require exact agreement with the batch queries, plus a
watermark late-data test."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.sources import load_table
from retail_sales_etl_pipeline_spark.streaming import (
    exactly_once_parquet_sink,
    read_events_stream,
    run_to_memory,
    run_with_exactly_once_sink,
    sessionized_counts,
    stream_stream_attribution,
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


def test_stream_stream_join_equals_batch_range_join(spark, events_dir):
    """Stream-stream watermarked join (purchases x trailing clicks) must
    produce exactly the batch join's pairs when driven over the full
    backlog — the streaming twin of q53's bin-and-refine range join."""
    stream = read_events_stream(spark, events_dir)
    joined = stream_stream_attribution(
        stream.filter(F.col("event_type") == "purchase"),
        stream.filter(F.col("event_type") == "click"),
    )
    got = {
        (r["p_event_id"], r["c_event_id"])
        for r in run_to_memory(joined, "ssj", output_mode="append").collect()
    }

    ev = spark.read.parquet(events_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    expect = {
        (r["p_event_id"], r["c_event_id"])
        for r in p.join(
            c,
            F.expr(
                "p_user_id = c_user_id AND c_ts < p_ts "
                "AND c_ts > p_ts - interval 30 minutes"
            ),
        ).collect()
    }
    assert got == expect
    assert expect  # non-vacuous: the fixture has matching pairs


def test_exactly_once_sink_idempotent_on_replay(spark, events_dir, tmp_path):
    """foreachBatch exactly-once: the backlog lands once despite the
    sink being re-invoked for an already-committed batch (simulated
    redelivery after a failure) — content must be unchanged."""
    src = str(tmp_path / "eo_src")
    spark.read.parquet(events_dir).repartition(4).write.parquet(src)
    sink = str(tmp_path / "eo_sink")
    ckpt = str(tmp_path / "eo_ckpt")
    stream = read_events_stream(spark, src, max_files_per_trigger=2)
    run_with_exactly_once_sink(stream.select("event_id", "user_id"), sink, ckpt)

    out = spark.read.parquet(sink)
    src_ids = sorted(
        r["event_id"] for r in spark.read.parquet(events_dir).collect()
    )
    assert sorted(r["event_id"] for r in out.collect()) == src_ids
    n_batches = out.select("batch_id").distinct().count()
    assert n_batches >= 2  # maxFilesPerTrigger actually split the backlog

    # simulate at-least-once redelivery: re-run batch 0's write with the
    # same batch_id and the same rows — the idempotent sink must
    # converge, not duplicate (materialize first: a real redelivery comes
    # from the source, not from the sink files the overwrite replaces)
    replay_rows = (
        spark.read.parquet(f"{sink}/batch_id=0")
        .select("event_id", "user_id")
        .collect()
    )
    replay_df = spark.createDataFrame(replay_rows, "event_id long, user_id long")
    exactly_once_parquet_sink(sink)(replay_df, 0)
    after = spark.read.parquet(sink)
    assert sorted(r["event_id"] for r in after.collect()) == src_ids
    assert after.select("batch_id").distinct().count() == n_batches


def test_watermark_dropped_row_set_deterministic(spark, tmp_path):
    """Out-of-order arrival fixture proving EXACTLY which rows the
    watermark drops. Three micro-batch runs over one checkpoint:

    run 1: ids 1-4 in-order -> watermark advances to 11:50 (max 12:50 - 1h)
    run 2: id 6 @10:30 falls in window [10:00,11:00) whose END (11:00) is
           below the 11:50 watermark -> DROPPED (the window is finalized);
           id 7 @11:40 is ALSO below the watermark timestamp-wise, but its
           window [11:00,12:00) is still open (end 12:00 > 11:50) -> KEPT
           (drop is by window end, not by raw timestamp); id 5 @11:55 and
           id 8 @14:10 are ordinary arrivals.
    run 3: flush row 99 @18:00 closes every earlier window

    Tracking event_ids with collect_set per window, the union of emitted
    ids must be exactly {1,2,3,4,5,7,8}: only 6 dropped, 99 still open."""
    src = str(tmp_path / "ooo_events")
    sink = str(tmp_path / "ooo_sink")
    ckpt = str(tmp_path / "ooo_ckpt")
    os.makedirs(src)
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )

    def run_once():
        stream = read_events_stream(spark, src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.collect_set("event_id").alias("ids"))
            .select(F.col("window.start").alias("window_start"), "ids")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def add_rows(rows):
        df = spark.createDataFrame(
            [(i, ts, 1, "click", 1.0, "{}") for i, ts in rows], schema
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("append").parquet(src)

    add_rows(
        [
            (1, "2024-01-01 10:05:00"),
            (2, "2024-01-01 10:20:00"),
            (3, "2024-01-01 11:10:00"),
            (4, "2024-01-01 12:50:00"),
        ]
    )
    run_once()
    add_rows(
        [
            (5, "2024-01-01 11:55:00"),  # ordinary arrival
            (6, "2024-01-01 10:30:00"),  # window finalized -> dropped
            (7, "2024-01-01 11:40:00"),  # late, but window still open -> kept
            (8, "2024-01-01 14:10:00"),  # fresh
        ]
    )
    run_once()
    add_rows([(99, "2024-01-01 18:00:00")])  # flush: closes all windows <= 17:00
    run_once()

    emitted = {
        str(r["window_start"]): sorted(r["ids"])
        for r in spark.read.parquet(sink).collect()
    }
    assert emitted == {
        "2024-01-01 10:00:00": [1, 2],
        "2024-01-01 11:00:00": [3, 5, 7],
        "2024-01-01 12:00:00": [4],
        "2024-01-01 14:00:00": [8],
    }
    kept = {i for ids in emitted.values() for i in ids}
    assert kept == {1, 2, 3, 4, 5, 7, 8}  # dropped set is exactly {6}


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


def test_sliding_1h_15m_stream_equals_q71_batch(spark, events_dir):
    """The streaming twin of q71_sliding_event_windows: the SAME 1-hour /
    15-minute sliding window over the same events, via
    windowed_event_counts(slide=...), must equal the batch registry query
    bit-for-bit. Streaming event time is LTZ (watermarks require it) while
    the batch loader carries NTZ — under the factory's pinned-UTC session
    the micros coincide, so we cast the streaming window_start to NTZ for
    the comparison (the documented one-session equivalence contract)."""
    from retail_sales_etl_pipeline_spark.plans.registry import load_all

    stream = read_events_stream(spark, events_dir)
    got = run_to_memory(
        windowed_event_counts(stream, window="1 hour", slide="15 minutes"),
        "q71_twin",
    ).withColumn("window_start", F.col("window_start").cast("timestamp_ntz"))

    batch = load_all()["q71_sliding_event_windows"].spark_fn(spark, SMOKE_SF_DIR)
    assert _canon(got) == _canon(batch)
