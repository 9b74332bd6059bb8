"""Deterministic stratified sampling / split semantics (q58): exact
reproducibility, rate accuracy, and split-leakage resistance."""

from __future__ import annotations

import pytest

from retail_sales_etl_pipeline_spark.plans.registry import load_all
from retail_sales_etl_pipeline_spark.plans.text_queries import SAMPLE_PCT, SPLIT_PCT

from .conftest import SMOKE_SF_DIR

REGISTRY = load_all()


@pytest.fixture(scope="module")
def sampled(spark):
    return REGISTRY["q58_stratified_sample_split"].spark_fn(
        spark, SMOKE_SF_DIR
    ).collect()


def test_sample_is_exactly_reproducible(spark, sampled):
    again = REGISTRY["q58_stratified_sample_split"].spark_fn(
        spark, SMOKE_SF_DIR
    ).collect()
    assert sorted(map(tuple, sampled)) == sorted(map(tuple, again))


def test_stratified_rates_roughly_hold(spark, sampled):
    from pyspark.sql import functions as F

    from retail_sales_etl_pipeline_spark.sources import load_table

    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, SMOKE_SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = {}
    for r in sampled:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    for lang, total in totals.items():
        pct = SAMPLE_PCT.get(lang, 10)
        expect = total * pct / 100
        # hash-uniformity tolerance on small strata
        assert abs(kept.get(lang, 0) - expect) <= max(6, 0.5 * expect), (
            lang, kept.get(lang, 0), expect, total
        )


def test_split_partitions_the_sample(sampled):
    assert {r["split"] for r in sampled} <= {"train", "val", "test"}
    n = len(sampled)
    n_train = sum(r["split"] == "train" for r in sampled)
    assert abs(n_train - n * SPLIT_PCT[0] / 100) <= max(6, 0.25 * n)
    # every kept doc gets exactly one split (one output row per doc)
    ids = [r["doc_id"] for r in sampled]
    assert len(ids) == len(set(ids))
