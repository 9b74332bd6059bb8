"""Streaming dedup (dropDuplicatesWithinWatermark) — the streaming twin of
the batch dedup ladder: batch-equality on in-window duplicates, plus a
multi-run out-of-order fixture pinning the exact drop / re-emit contract,
mirroring tests/test_streaming.py's watermark-drop proof style.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.sources import load_table
from retail_sales_etl_pipeline_spark.streaming import (
    dedup_stream_within_watermark,
    fingerprint_events,
    read_events_stream,
    run_to_memory,
)

from .conftest import SMOKE_SF_DIR

SCHEMA = (
    "event_id long, ts string, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def dup_events_dir(spark, tmp_path_factory):
    """Events with REAL in-window duplicates: the raw table plus an exact
    copy of a third of it shifted by one event_id namespace (same content
    columns, same timestamps -> same fingerprint within the window)."""
    base = load_table(spark, SMOKE_SF_DIR, "events")
    dups = base.filter(F.col("event_id") % 3 == 0).withColumn(
        "event_id", F.col("event_id") + 1_000_000
    )
    d = str(tmp_path_factory.mktemp("dup_events") / "events")
    base.unionByName(dups).write.parquet(d)
    return d


def test_stream_dedup_equals_batch_on_full_backlog(spark, dup_events_dir):
    """Driven over the whole backlog in one availableNow run (all
    duplicates in-window), streaming dedup must keep exactly one row per
    content fingerprint — the batch dropDuplicates key set."""
    stream = fingerprint_events(
        read_events_stream(spark, dup_events_dir).withColumn(
            "ts_key", F.col("ts").cast("string")
        ),
        content_cols=("user_id", "event_type", "value", "props", "ts_key"),
    )
    got = run_to_memory(
        dedup_stream_within_watermark(stream), "dedup_stream", output_mode="append"
    )
    got_fps = sorted(r["content_fp"] for r in got.select("content_fp").collect())

    batch = fingerprint_events(
        spark.read.parquet(dup_events_dir).withColumn(
            "ts_key", F.col("ts").cast("string")
        ),
        content_cols=("user_id", "event_type", "value", "props", "ts_key"),
    )
    exp_fps = sorted(
        r["content_fp"]
        for r in batch.select("content_fp").distinct().collect()
    )
    assert got_fps == exp_fps
    # non-vacuous: the fixture really contained duplicates
    assert batch.count() > len(exp_fps)


def test_dedup_drop_and_reemit_contract(spark, tmp_path):
    """Multi-run out-of-order fixture over one checkpoint (watermark 1h,
    dedup key = user_id+event_type content fingerprint):

    run 1: id1 key-A @12:00 -> EMITTED (first arrival)
           id2 key-A @12:05 -> DROPPED (in-window duplicate)
           id3 key-B @15:00 -> EMITTED; advances watermark to 14:00
    run 2: id4 key-A @12:10 -> DROPPED (event time below watermark: late)
           id5 key-C @14:30 -> EMITTED (new key above watermark)
           id6 key-C @14:40 -> DROPPED (in-window duplicate)
           id7 key-B @15:30 -> DROPPED (B still in state til 16:00)
    run 3: id8 key-A @19:30 -> EMITTED AGAIN (A's state expired: bounded-
           state tradeoff — dedup is exact only within the watermark)
           id9 key-D @20:00 -> EMITTED

    Exact expected output: ids {1, 3, 5, 8, 9}."""
    src = str(tmp_path / "dedup_src")
    sink = str(tmp_path / "dedup_sink")
    ckpt = str(tmp_path / "dedup_ckpt")
    os.makedirs(src)

    def run_once():
        stream = fingerprint_events(
            read_events_stream(spark, src), content_cols=("user_id", "event_type")
        )
        q = (
            dedup_stream_within_watermark(stream)
            .select("event_id", "content_fp")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def add_rows(rows):
        df = spark.createDataFrame(
            [(i, ts, uid, "click", 1.0, "{}") for i, ts, uid in rows], SCHEMA
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("append").parquet(src)

    A, B, C, D = 1, 2, 3, 4
    add_rows([(1, "2024-01-01 12:00:00", A), (2, "2024-01-01 12:05:00", A),
              (3, "2024-01-01 15:00:00", B)])
    run_once()
    add_rows([(4, "2024-01-01 12:10:00", A), (5, "2024-01-01 14:30:00", C),
              (6, "2024-01-01 14:40:00", C), (7, "2024-01-01 15:30:00", B)])
    run_once()
    add_rows([(8, "2024-01-01 19:30:00", A), (9, "2024-01-01 20:00:00", D)])
    run_once()

    got = sorted(r["event_id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 3, 5, 8, 9]


def test_stream_static_index_dedup_equals_batch(spark, dup_events_dir):
    """Stream-static anti join (dedup_stream_against_index): streaming the
    duplicated events against a static fingerprint index built from the
    base third must drop exactly the rows a batch anti join drops, and
    compose with fingerprint_events on both sides."""
    from retail_sales_etl_pipeline_spark.streaming import (
        dedup_stream_against_index,
        fingerprint_events,
        read_events_stream,
        run_to_memory,
    )

    all_events = spark.read.parquet(dup_events_dir)
    # static index: fingerprints of the original event_id % 3 == 0 third
    index = fingerprint_events(
        all_events.filter(
            (F.col("event_id") % 3 == 0) & (F.col("event_id") < 1_000_000)
        )
    ).select("content_fp")

    stream = fingerprint_events(read_events_stream(spark, dup_events_dir))
    got = run_to_memory(
        dedup_stream_against_index(stream, index), "idx_dedup",
        output_mode="append",  # stateless map/filter stream: no aggregation
    )
    batch = fingerprint_events(all_events).join(index, "content_fp", "left_anti")

    got_ids = sorted(r["event_id"] for r in got.collect())
    batch_ids = sorted(r["event_id"] for r in batch.collect())
    assert got_ids == batch_ids
    # both copies of an indexed row are dropped (content identity, not id)
    assert not any(i % 3 == 0 for i in got_ids if i < 1_000_000)
    assert not any((i - 1_000_000) % 3 == 0 for i in got_ids if i >= 1_000_000)
    assert got_ids  # the non-indexed rows all pass through


def test_full_incremental_ladder_composes(spark, dup_events_dir):
    """The composed streaming dedup ladder the module doc promises:
    within-stream duplicates removed by the watermark operator, already-
    indexed content removed by the stream-static anti join — in one
    streaming plan. With all duplicates in-window (same timestamps), the
    result must equal the batch form exactly: distinct-by-fingerprint
    events minus indexed fingerprints."""
    from retail_sales_etl_pipeline_spark.streaming import (
        dedup_stream_against_index,
        dedup_stream_within_watermark,
        fingerprint_events,
        read_events_stream,
        run_to_memory,
    )

    all_events = spark.read.parquet(dup_events_dir)
    index = fingerprint_events(
        all_events.filter(
            (F.col("event_id") % 5 == 0) & (F.col("event_id") < 1_000_000)
        )
    ).select("content_fp")

    stream = fingerprint_events(read_events_stream(spark, dup_events_dir))
    ladder = dedup_stream_against_index(
        dedup_stream_within_watermark(stream), index
    )
    got = run_to_memory(ladder, "ladder", output_mode="append")

    from pyspark.sql import Window

    batch = (
        fingerprint_events(all_events)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("content_fp").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .join(index, "content_fp", "left_anti")
    )
    # streaming first-arrival within a micro-batch is nondeterministic in
    # WHICH duplicate row survives, but the surviving CONTENT set is not
    got_fps = sorted(r["content_fp"] for r in got.collect())
    batch_fps = sorted(r["content_fp"] for r in batch.collect())
    assert got_fps == batch_fps
    assert got_fps  # non-trivial survivor set
