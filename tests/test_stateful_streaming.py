"""Custom stateful streaming operator: state must carry across
micro-batches and the final running totals must equal the batch aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.streaming.events import read_events_stream
from retail_sales_etl_pipeline_spark.streaming.stateful import running_user_totals


@pytest.fixture()
def two_batch_events(spark, tmp_path):
    d = str(tmp_path / "ev")
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )
    b1 = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1, "click", 1.5, "{}"),
            (2, "2024-01-01 10:01:00", 2, "click", 2.0, "{}"),
        ],
        schema,
    ).withColumn("ts", F.to_timestamp("ts"))
    b2 = spark.createDataFrame(
        [
            (3, "2024-01-01 10:02:00", 1, "view", 0.5, "{}"),
            (4, "2024-01-01 10:03:00", 1, "click", 1.0, "{}"),
        ],
        schema,
    ).withColumn("ts", F.to_timestamp("ts"))
    b1.coalesce(1).write.mode("append").parquet(d)
    b2.coalesce(1).write.mode("append").parquet(d)
    return d


def test_state_carries_across_microbatches(spark, two_batch_events):
    stream = read_events_stream(spark, two_batch_events, max_files_per_trigger=1)
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM running_totals").collect()

    # update mode emits one row per touched user per micro-batch; the LAST
    # emission per user is the running total, which must equal the batch
    # aggregate over all files.
    last = {}
    for r in out:  # memory sink appends in batch order
        last[r["user_id"]] = (r["n_events"], r["value_sum"])
    batch = {
        r["user_id"]: (r["n"], r["v"])
        for r in spark.read.parquet(two_batch_events)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert last == batch
    # user 1 must have been emitted in both micro-batches (state carried):
    u1_emissions = [r for r in out if r["user_id"] == 1]
    assert len(u1_emissions) >= 2


# ---------------------------------------------------------------------------
# Streaming interval union (the q170 twin)


@pytest.fixture()
def ordered_span_batches(spark, tmp_path):
    # Two time-ordered micro-batches with an island crossing the batch
    # boundary: user 1's (t=0, 100s) span from batch 1 must swallow the
    # (t=30, 10s) span arriving in batch 2, and user 1's (t=121, 5s)
    # span must open a second island.
    d = str(tmp_path / "events.parquet")
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )
    base = "2024-01-01 10:00:"

    def row(eid, uid, sec, dur):
        return (eid, f"2024-01-01 10:{sec // 60:02d}:{sec % 60:02d}", uid,
                "view", float(dur), "{}")

    b1 = spark.createDataFrame(
        [row(1, 1, 0, 100), row(2, 2, 10, 10)], schema
    ).withColumn("ts", F.to_timestamp("ts"))
    b2 = spark.createDataFrame(
        [row(3, 1, 30, 10), row(4, 1, 95, 25), row(5, 1, 121, 5),
         row(6, 2, 20, 10)],
        schema,
    ).withColumn("ts", F.to_timestamp("ts"))
    b1.coalesce(1).write.mode("append").parquet(d)
    b2.coalesce(1).write.mode("append").parquet(d)
    return str(tmp_path)


def test_streaming_interval_union_equals_batch_q170(
    spark, ordered_span_batches
):
    from retail_sales_etl_pipeline_spark.plans.event_queries import (
        q170_interval_union,
    )
    from retail_sales_etl_pipeline_spark.streaming.stateful import (
        interval_union_running,
    )

    stream = read_events_stream(
        spark,
        ordered_span_batches + "/events.parquet",
        max_files_per_trigger=1,
    )
    q = (
        interval_union_running(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("interval_union")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM interval_union").collect()
    last = {}
    for r in out:  # memory sink appends in micro-batch order
        last[r["user_id"]] = (r["n_islands"], r["n_spans"], r["covered_us"])

    batch = {
        r["user_id"]: (r["n_islands"], r["n_spans"], r["covered_us"])
        for r in q170_interval_union(spark, ordered_span_batches).collect()
    }
    assert last == batch
    # and the crafted semantics hold: the long span swallowed the short
    assert last[1] == (2, 4, (120 - 0 + 5) * 1_000_000)
    assert last[2] == (1, 2, 20 * 1_000_000)


# ---------------------------------------------------------------------------
# Streaming EWMA (the q179 twin)


def test_streaming_ewma_equals_batch_q179(spark, tmp_path):
    import shutil

    from retail_sales_etl_pipeline_spark.plans.event_queries import (
        q179_ewma_features,
    )
    from retail_sales_etl_pipeline_spark.sources import load_table
    from retail_sales_etl_pipeline_spark.streaming.stateful import (
        ewma_running,
    )

    # two time-ordered micro-batches carved from the real smoke events
    from .conftest import SMOKE_SF_DIR

    d = str(tmp_path / "events.parquet")
    ev = load_table(spark, SMOKE_SF_DIR, "events").orderBy("ts", "event_id")
    n = ev.count()
    cutoff = ev.limit(n // 2).agg(F.max("ts")).collect()[0][0]
    ev.filter(F.col("ts") <= F.lit(cutoff)).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    ev.filter(F.col("ts") > F.lit(cutoff)).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    stream = read_events_stream(spark, d, max_files_per_trigger=1)
    q = (
        ewma_running(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_running")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM ewma_running").collect()
    last = {}
    for r in out:  # memory sink appends in micro-batch order
        last[r["user_id"]] = (r["n_used"], r["ewma_micro"])

    batch = {
        r["user_id"]: (r["n_used"], r["ewma_micro"])
        for r in q179_ewma_features(spark, SMOKE_SF_DIR).collect()
    }
    assert last == batch
    shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Checkpoint restart: custom state must survive a full query stop +
# restart from the same checkpoint — the property that makes the
# stateful operators deployable (executor loss, upgrade, nightly
# restart all replay through this path).


def test_state_survives_checkpoint_restart(spark, tmp_path):
    import pandas as pd

    data = str(tmp_path / "events.parquet")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(data)

    from datetime import datetime

    t0 = datetime(2024, 1, 1, 10, 0, 0)
    write_batch([(1, t0, 1, "view", 10.0, "{}"), (2, t0, 2, "view", 5.0, "{}")])

    def run_once():
        got = {}

        def sink(df, _bid):
            for r in df.collect():
                got[r["user_id"]] = (r["n_events"], r["value_sum"])

        q = (
            running_user_totals(read_events_stream(spark, data))
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    first = run_once()
    assert first[1] == (1, 10.0) and first[2] == (1, 5.0)

    # stop happened (availableNow drained); new data arrives while down
    t1 = datetime(2024, 1, 1, 11, 0, 0)
    write_batch([(3, t1, 1, "view", 2.5, "{}")])

    second = run_once()
    # user 1's state CARRIED across the restart: totals are cumulative
    # over both files even though run 2 only read the new file
    assert second[1] == (2, 12.5)
    # user 2 had no new events: update mode emits nothing for them in
    # run 2 (their state is intact but silent) — the absence is itself
    # evidence run 2 did not reprocess file 1
    assert 2 not in second
