"""Exactly-once streaming sinks via foreachBatch.

Structured Streaming guarantees at-least-once delivery of micro-batches to
``foreachBatch`` (a batch can be re-delivered after a failure, with the
SAME batch_id). Exactly-once therefore means: make the per-batch write
IDEMPOTENT on (checkpoint, batch_id). The standard pattern — used by every
transactional Spark sink — is to key the output by batch_id and let a
replay overwrite its own previous (possibly partial) attempt:

    stream.writeStream.foreachBatch(exactly_once_parquet_sink(path)) ...

Replaying batch N rewrites batch_id=N with identical deterministic content
and touches nothing else, so the sink converges no matter how many times
a batch is retried.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def exactly_once_parquet_sink(path: str):
    """foreachBatch function writing each micro-batch to a
    ``batch_id=N`` partition directory with overwrite semantics.

    - overwrite (not append): a redelivered batch replaces its own prior
      partial output instead of duplicating rows.
    - partition-dir-per-batch: replay of batch N cannot disturb batch M.
    - downstream reads ``spark.read.parquet(path)`` and sees each batch's
      rows exactly once.
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return write_batch


def run_with_exactly_once_sink(
    stream_df: DataFrame, path: str, checkpoint: str
) -> None:
    """Drive a stream over the available backlog into the idempotent sink."""
    q = (
        stream_df.writeStream.foreachBatch(exactly_once_parquet_sink(path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
