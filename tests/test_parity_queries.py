"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (fast smoke — the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from retail_sales_etl_pipeline_spark.plans.registry import load_all

from .conftest import SMOKE_SF_DIR
from .oracle_util import assert_matches_oracle

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    df = q.spark_fn(spark, SMOKE_SF_DIR)
    if q.oracle is None:
        # rows-only contract: must run and produce a stable, non-erroring result
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, q.oracle, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable schema


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 16
