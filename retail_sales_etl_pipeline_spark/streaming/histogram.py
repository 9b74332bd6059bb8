"""Streaming histogram-quantile rollup — the streaming twin of the batch
shard-merge proof (plans/event_queries.q240_histogram_quantile_merge).

Production shape at 100 TB: q240 proved the centi-bucket histogram's
merge is LOSSLESS (associative integer SUM), which is exactly what makes
it streamable — each micro-batch's bucket counts SUM into a running
bucket table (``foreachBatch`` upsert into a bins-sized store), and the
global P50/P90/P99 read off the merged CDF at any moment, no reprocessing
of history ever. State is one count per occupied bucket: bounded by the
VALUE DOMAIN (centi-resolution of a physical measure), not the stream
length — complete output mode is safe however long the stream runs, the
same argument as the drift monitor's bin counts.

Two pieces, both tiny by design:

- ``value_bucket_counts_stream``: running per-centi-bucket counts via
  Spark's built-in streaming aggregation (distributed, fault-tolerant
  state; bucket counting is exactly the shape groupBy().count() already
  handles — no custom stateful operator).
- ``quantiles_from_buckets``: q240's EXACT integer quantile rule
  (smallest bucket whose cumulative count reaches ppm*n/1e6) evaluated
  on a (b, cnt) bucket relation — a buckets-sized reduction, callable
  from ``foreachBatch`` per micro-batch or once at the end.

Stream == batch is an integer equality (same buckets, same rule):
asserted against q240's merged/direct columns in
tests/test_streaming_histogram.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.event_queries import QTL_PPM


def value_bucket_counts_stream(events: DataFrame) -> DataFrame:
    """Running centi-bucket counts of the live stream (q240's grid)."""
    return (
        events.selectExpr(
            "CAST(FLOOR(value * 100.0) AS BIGINT) AS b"
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def quantiles_from_buckets(
    buckets: DataFrame, ppms: tuple[int, ...] = QTL_PPM
) -> dict[int, int]:
    """q240's exact quantile rule over a (b, cnt) relation: for each ppm,
    the smallest bucket whose cumulative count c satisfies
    1e6*c >= ppm*n. Exact integers end to end (c <= n, so both sides
    cross int64 only past 9.2e12 rows). The input is buckets-sized
    (bounded by the value domain), so collecting the per-ppm minima is a
    driver-scalar read, not a data read."""
    rows = buckets.orderBy("b").collect()
    n = sum(r["cnt"] for r in rows)
    out: dict[int, int] = {}
    if n == 0:
        return out
    cum = 0
    targets = sorted(ppms)
    it = iter(targets)
    want = next(it, None)
    for r in rows:
        cum += r["cnt"]
        while want is not None and 1_000_000 * cum >= want * n:
            out[want] = r["b"]
            want = next(it, None)
    return out
