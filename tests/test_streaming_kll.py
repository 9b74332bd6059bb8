"""Streaming KLL rollup (streaming/kll_rollup.py) vs batch q241.

q241's batch certification claims the deterministic KLL sketch is safe
to roll up shard-by-shard without re-reading history. These tests prove
it in-stream: a foreachBatch merge into a running sketch must (1) be
bit-identically REPLAYABLE from the same micro-batch contents in batch
mode (the recovery/backfill guarantee a deterministic compactor buys),
and (2) satisfy the merge CONTRACT against the one-shot batch sketch —
exact total weight and every estimate rank-certified within budget
(retained items may legitimately differ between merge trees)."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.operators.kll import total_weight
from retail_sales_etl_pipeline_spark.sources import load_table
from retail_sales_etl_pipeline_spark.streaming.events import (
    read_events_stream,
)
from retail_sales_etl_pipeline_spark.streaming.kll_rollup import (
    KllRollup,
    certify_against_exact,
    exact_centi_hist,
    one_shot_sketch,
    sketches_identical,
)

from .conftest import SMOKE_SF_DIR


def _run_rollup_stream(spark, tmp_path):
    """Drive the smoke events through a 3-file stream; capture each
    micro-batch's rows so the replay twin folds EXACTLY the same batch
    contents (file-discovery order independent)."""
    d = str(tmp_path / "ev.parquet")
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    for m in range(3):
        ev.filter(F.col("event_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    rollup = KllRollup()
    batch_rows: list[list] = []

    def sink(batch_df, batch_id):
        pinned = batch_df.select(
            "event_id", "event_type", "value"
        ).collect()
        batch_rows.append(pinned)
        rollup.fold_batch(
            spark.createDataFrame(
                pinned, "event_id long, event_type string, value double"
            )
        )

    q = (
        read_events_stream(spark, d, max_files_per_trigger=1)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rollup, batch_rows


def test_stream_rollup_replay_identity_and_contract(spark, tmp_path):
    rollup, batch_rows = _run_rollup_stream(spark, tmp_path)
    assert rollup.n_batches >= 3  # real micro-batches, not one gulp

    # (1) replay twin: fold the same batch contents in batch mode —
    # the deterministic compactor must reproduce the sketch EXACTLY
    replay = KllRollup()
    for rows in batch_rows:
        replay.fold_batch(
            spark.createDataFrame(
                rows, "event_id long, event_type string, value double"
            )
        )
    assert sketches_identical(rollup.snapshot(), replay.snapshot())

    # (2) contract identity vs the one-shot q241-shaped batch sketch
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    batch_levels, batch_budget = one_shot_sketch(ev)
    hist = exact_centi_hist(ev)
    n_exact = sum(c for _, c in hist)

    stream_cert = certify_against_exact(*rollup.snapshot(), hist)
    batch_cert = certify_against_exact(batch_levels, batch_budget, hist)

    # total weight exact on BOTH sides — the lossless-merge half
    assert stream_cert["weight_preserved"] and batch_cert["weight_preserved"]
    assert total_weight(rollup.levels) == n_exact
    # every quantile estimate rank-certified within its own budget
    assert stream_cert["certified_all"], stream_cert
    assert batch_cert["certified_all"], batch_cert
    # incremental merging pays extra compactions, so the streamed budget
    # may exceed the one-shot budget — but it must stay the SAME ORDER
    # (the contract: budgets add + 2^h per new compaction, no blowup)
    assert stream_cert["budget"] <= 4 * max(batch_cert["budget"], 1), (
        stream_cert["budget"],
        batch_cert["budget"],
    )


def test_rollup_empty_batches_are_noops(spark):
    rollup = KllRollup()
    empty = spark.createDataFrame(
        [], "event_id long, event_type string, value double"
    )
    rollup.fold_batch(empty)
    assert rollup.levels == [] and rollup.budget == 0
    rollup.fold_batch(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0)],
            "event_id long, event_type string, value double",
        )
    )
    assert total_weight(rollup.levels) == 2
    rollup.fold_batch(empty)
    assert total_weight(rollup.levels) == 2
