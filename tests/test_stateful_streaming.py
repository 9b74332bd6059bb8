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
