"""Streaming drift monitor (streaming/drift.py) == batch PSI (q173).

The reference distribution is the early window of the smoke events
table; the 'live' stream is the late window fed through a file-source
stream in micro-batches. The final running PSI must equal — integer
equality, same fixed point — the sum of q173's per-bin contributions
on the identical data.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans.event_queries import (
    PSI_SPLIT_TS,
    q173_distribution_drift_psi,
)
from retail_sales_etl_pipeline_spark.sources import load_table
from retail_sales_etl_pipeline_spark.streaming.drift import (
    bin_counts_stream,
    psi_against_reference,
)
from retail_sales_etl_pipeline_spark.streaming.events import (
    read_events_stream,
)

from .conftest import SMOKE_SF_DIR


@pytest.fixture()
def late_window_stream_dir(spark, tmp_path):
    # late-window events written as two files -> two micro-batches
    d = str(tmp_path / "late.parquet")
    late = load_table(spark, SMOKE_SF_DIR, "events").filter(
        F.col("ts") >= F.lit(PSI_SPLIT_TS).cast("timestamp_ntz")
    )
    half = late.filter(F.col("event_id") % 2 == 0)
    other = late.subtract(half)
    half.coalesce(1).write.mode("append").parquet(d)
    other.coalesce(1).write.mode("append").parquet(d)
    return d


def test_streaming_psi_equals_batch_q173(spark, late_window_stream_dir):
    # reference = early-window bin counts, batch-built
    early = load_table(spark, SMOKE_SF_DIR, "events").filter(
        F.col("ts") < F.lit(PSI_SPLIT_TS).cast("timestamp_ntz")
    )
    ref_counts = bin_counts_stream(early)

    stream = read_events_stream(
        spark, late_window_stream_dir, max_files_per_trigger=1
    )
    seen: list[int] = []

    def on_batch(counts_df, batch_id: int) -> None:
        psi = psi_against_reference(counts_df, ref_counts)
        if psi is not None:
            seen.append(psi)

    q = (
        bin_counts_stream(stream)
        .writeStream.outputMode("complete")
        .foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(seen) >= 2  # one reading per micro-batch
    batch_psi = (
        q173_distribution_drift_psi(spark, SMOKE_SF_DIR)
        .agg(F.sum("psi_contrib_micro").alias("s"))
        .collect()[0]["s"]
    )
    assert seen[-1] == batch_psi  # integer equality, same fixed point
    # running PSI must be finite and non-negative at every reading
    assert all(p >= 0 for p in seen)
