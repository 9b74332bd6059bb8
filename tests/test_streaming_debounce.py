"""Kept-relative streaming debounce: state (last kept ts) must carry
across micro-batches, and the semantics must match a sequential Python
recount — including the case where they DIVERGE from the batch lag-form
(a chain of sub-window gaps collapses entirely under lag-form but keeps
every window-th event under kept-relative)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.streaming.debounce import debounce_events
from retail_sales_etl_pipeline_spark.streaming.events import read_events_stream

SCHEMA = (
    "event_id long, ts string, user_id long, event_type string, "
    "value double, props string"
)

# user 1: a chain of 7-minute gaps (each < 10 min): lag-form keeps only
# the first event; kept-relative keeps events at +0, +14, +28 minutes.
# user 2: one in-window burst then a clear gap, split ACROSS batches so
# the cross-batch state carry is what drops event 22.
BATCH1 = [
    (10, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
    (11, "2024-01-01 10:07:00", 1, "click", 0.0, "{}"),
    (12, "2024-01-01 10:14:00", 1, "click", 0.0, "{}"),
    (20, "2024-01-01 09:00:00", 2, "view", 0.0, "{}"),
    (21, "2024-01-01 09:05:00", 2, "view", 0.0, "{}"),
]
BATCH2 = [
    (13, "2024-01-01 10:21:00", 1, "click", 0.0, "{}"),
    (14, "2024-01-01 10:28:00", 1, "click", 0.0, "{}"),
    (22, "2024-01-01 09:09:00", 2, "view", 0.0, "{}"),
    (23, "2024-01-01 09:30:00", 2, "view", 0.0, "{}"),
]


def sequential_recount(batches, gap_s=600):
    kept, last = [], {}
    for batch in batches:
        for eid, ts, uid, *_ in sorted(batch, key=lambda r: (r[1], r[0])):
            import datetime as dt

            t = dt.datetime.fromisoformat(ts)
            if uid not in last or (t - last[uid]).total_seconds() > gap_s:
                kept.append(eid)
                last[uid] = t
    return sorted(kept)


@pytest.fixture()
def two_batch_dir(spark, tmp_path):
    d = str(tmp_path / "ev")
    for rows in (BATCH1, BATCH2):
        (
            spark.createDataFrame(rows, SCHEMA)
            .withColumn("ts", F.to_timestamp("ts"))
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )
    return d


def test_kept_relative_debounce_across_batches(spark, two_batch_dir):
    stream = read_events_stream(spark, two_batch_dir, max_files_per_trigger=1)
    q = (
        debounce_events(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("debounced")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r["event_id"] for r in spark.sql("SELECT * FROM debounced").collect()
    )
    expected = sequential_recount([BATCH1, BATCH2])
    assert got == expected
    # the divergence the stateful form exists for: kept-relative keeps the
    # +14/+28-minute events of user 1's sub-window chain (lag-form would
    # drop everything after the first), and drops the cross-batch
    # in-window event 22.
    assert {10, 12, 14} <= set(got)
    assert 22 not in got and 11 not in got and 13 not in got


def test_debounce_expire_state_same_survivors(spark, two_batch_dir):
    # the bounded-state form must produce the IDENTICAL survivor set —
    # expiry only ever removes state the watermark has proven irrelevant
    stream = read_events_stream(spark, two_batch_dir, max_files_per_trigger=1)
    q = (
        debounce_events(stream, expire_state=True)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("debounced_exp")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r["event_id"]
        for r in spark.sql("SELECT * FROM debounced_exp").collect()
    )
    assert got == sequential_recount([BATCH1, BATCH2])


def test_debounce_expire_state_drops_idle_keys(spark, tmp_path):
    # user 3's last activity is one watermark-delay + gap behind the
    # stream head by batch 2: its state must be EXPIRED (store holds only
    # user 1), while the survivor set is untouched.
    batch_a = [
        (30, "2024-01-01 08:00:00", 3, "view", 0.0, "{}"),
        (40, "2024-01-01 12:00:00", 1, "click", 0.0, "{}"),
    ]
    batch_b = [
        (41, "2024-01-01 12:30:00", 1, "click", 0.0, "{}"),
    ]
    d = str(tmp_path / "ev_exp")
    for rows in (batch_a, batch_b):
        (
            spark.createDataFrame(rows, SCHEMA)
            .withColumn("ts", F.to_timestamp("ts"))
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )
    stream = read_events_stream(spark, d, max_files_per_trigger=1)
    q = (
        debounce_events(stream, expire_state=True)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("debounced_idle")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r["event_id"]
        for r in spark.sql("SELECT * FROM debounced_idle").collect()
    )
    assert got == [30, 40, 41]
    # batch 2 ran with watermark 10:00 (12:00 - 2h) > user 3's
    # last_kept+gap (08:10) -> its state row was removed in-run
    state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    assert state_rows == 1


def test_debounce_empty_batch_preserves_state(spark, tmp_path):
    # a single batch: baseline sanity of the operator on one trigger
    d = str(tmp_path / "ev1")
    (
        spark.createDataFrame(BATCH1, SCHEMA)
        .withColumn("ts", F.to_timestamp("ts"))
        .coalesce(1)
        .write.parquet(d)
    )
    stream = read_events_stream(spark, d)
    q = (
        debounce_events(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("debounced_one")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r["event_id"] for r in spark.sql("SELECT * FROM debounced_one").collect()
    )
    assert got == sequential_recount([BATCH1])
