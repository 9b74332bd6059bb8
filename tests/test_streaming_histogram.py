"""Streaming histogram-quantile rollup (streaming/histogram.py) == batch
q240 (the shard-merge identity query).

q240 proved the centi-bucket histogram merge is lossless batch-side;
this asserts the STREAMING form of the same merge — running bucket
counts accumulated across micro-batches — lands on the identical
buckets and therefore identical quantiles, as integer equalities.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans.event_queries import (
    QTL_PPM,
    q240_histogram_quantile_merge,
)
from retail_sales_etl_pipeline_spark.sources import load_table
from retail_sales_etl_pipeline_spark.streaming.events import (
    read_events_stream,
)
from retail_sales_etl_pipeline_spark.streaming.histogram import (
    quantiles_from_buckets,
    value_bucket_counts_stream,
)

from .conftest import SMOKE_SF_DIR


def _stream_dir(spark, tmp_path) -> str:
    """Events split into three files -> three micro-batches."""
    d = str(tmp_path / "ev.parquet")
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    for m in range(3):
        ev.filter(F.col("event_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    return d


def test_streaming_quantiles_equal_batch_q240(spark, tmp_path):
    stream = read_events_stream(
        spark, _stream_dir(spark, tmp_path), max_files_per_trigger=1
    )
    readings: list[dict[int, int]] = []

    def on_batch(buckets_df, batch_id: int) -> None:
        readings.append(quantiles_from_buckets(buckets_df))

    q = (
        value_bucket_counts_stream(stream)
        .writeStream.outputMode("complete")
        .foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(readings) >= 3  # one quantile reading per micro-batch

    batch = {
        r["ppm"]: r
        for r in q240_histogram_quantile_merge(spark, SMOKE_SF_DIR).collect()
    }
    # q240's in-query identity must hold, and the stream's final state
    # must land on the very same buckets — integer equality
    for ppm in QTL_PPM:
        assert batch[ppm]["merge_identity_holds"] == 1
        assert readings[-1][ppm] == batch[ppm]["merged_bucket_centi"]
    # monotone refinement sanity: every intermediate reading yields all
    # three quantiles once any data has arrived
    assert all(set(r) == set(QTL_PPM) for r in readings)


def test_quantiles_from_buckets_empty(spark):
    empty = spark.createDataFrame([], "b long, cnt long")
    assert quantiles_from_buckets(empty) == {}
