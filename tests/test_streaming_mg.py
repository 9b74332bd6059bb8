"""Streaming Misra-Gries rollup (streaming/heavy_hitters.py) == batch
q251 (the candidate->verify heavy-hitter query).

The stream folds each micro-batch's distributed shard summaries into one
running K-counter summary; the VERIFIED output driven by that state must
equal the batch query row-for-row (the recall theorem composed across
the merge tree), and the state must stay K-bounded however many batches
arrive. No replay bit-identity is claimed — MG residuals are fold-order
dependent, which is exactly why only verified output is compared (the
module docstring's contrast with the KLL rollup twin).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans.registry import load_all
from retail_sales_etl_pipeline_spark.plans.text_queries import MG_K
from retail_sales_etl_pipeline_spark.sources import load_table
from retail_sales_etl_pipeline_spark.streaming.heavy_hitters import (
    MgRollup,
    merge_mg,
    read_documents_stream,
    verified_heavy_hitters,
)

from .conftest import SMOKE_SF_DIR

REGISTRY = load_all()


def _stream_dir(spark, tmp_path) -> str:
    """Documents split into three files -> three micro-batches."""
    d = str(tmp_path / "docs.parquet")
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    return d


def test_merge_mg_rule_is_a_valid_summary_merge():
    # exact summaries of two chunks -> merged summary must keep any
    # token whose TOTAL count > n/(k+1), with residual >= count - n/(k+1)
    k = 3
    a = {"hot": 50, "x": 1, "y": 1}
    b = {"hot": 30, "z": 40, "w": 2}
    out = merge_mg(a, [b], k)
    n = sum(a.values()) + sum(b.values())  # 124, threshold ~31
    assert "hot" in out and out["hot"] >= 80 - n // (k + 1)
    assert "z" in out  # 40 > 31
    assert len(out) <= k


def test_streaming_mg_verified_output_equals_batch_q251(spark, tmp_path):
    stream = read_documents_stream(
        spark, _stream_dir(spark, tmp_path), max_files_per_trigger=1
    )
    rollup = MgRollup(MG_K)
    states: list[int] = []

    def on_batch(batch_df, batch_id: int) -> None:
        rollup.sink(batch_df, batch_id)
        states.append(len(rollup.counters))

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert rollup.n_batches >= 3
    # state bound: never more than K counters, however many batches
    assert rollup.max_state <= MG_K
    assert all(s <= MG_K for s in states)

    all_docs = load_table(spark, SMOKE_SF_DIR, "documents")
    got = {
        tuple(r)
        for r in verified_heavy_hitters(spark, all_docs, rollup).collect()
    }
    expected = {
        tuple(r)
        for r in REGISTRY["q251_misra_gries_heavy_hitters"]
        .spark_fn(spark, SMOKE_SF_DIR)
        .collect()
    }
    assert got == expected
    assert len(got) > 0
    # the stream counted every token exactly once across micro-batches:
    # every row's n_tokens column (index 2) must equal the rollup's count
    assert {r[2] for r in expected} == {rollup.n_tokens}
