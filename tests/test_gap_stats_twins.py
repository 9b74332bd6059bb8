"""The three user-gap-stats shapes (q55 all-JVM window+median, q83
batched mapInPandas, q154 per-group applyInPandas) must be row-identical
— and q83 must stay correct when a partition spans MULTIPLE Arrow
batches, the regime where an unsorted/uncarried batched implementation
silently splits a user's stats (invisible at sf<=0.1, where every
partition fits one default 10k-row batch; guaranteed at sf1+).
"""

from __future__ import annotations

from retail_sales_etl_pipeline_spark.plans.event_queries import (
    q55_user_gap_stats,
    q83_user_gap_stats_batched,
    q154_user_gap_stats_grouped,
)

SF = "/root/testdata/sf0.001"


def _key_rows(df):
    return sorted(
        (r.user_id, r.n_gaps, r.min_gap_us, r.max_gap_us, r.median_gap_us)
        for r in df.collect()
    )


def test_three_shapes_identical(spark):
    jvm = _key_rows(q55_user_gap_stats(spark, SF))
    batched = _key_rows(q83_user_gap_stats_batched(spark, SF))
    grouped = _key_rows(q154_user_gap_stats_grouped(spark, SF))
    assert jvm, "expected non-empty gap stats at sf0.001"
    assert batched == jvm
    assert grouped == jvm


def test_batched_survives_multi_batch_partitions(spark):
    """Force tiny Arrow batches so every partition splits into many
    batches and users straddle batch boundaries — the carry logic must
    keep each user's stats whole (one row per user, batch-size
    invariant)."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "7")  # far below any per-user history size
        tiny = _key_rows(q83_user_gap_stats_batched(spark, SF))
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert tiny == _key_rows(q55_user_gap_stats(spark, SF))
