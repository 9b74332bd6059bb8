"""Every registered query must run (not necessarily return rows) on an
EMPTY dataset with the production schemas — the 100 TB reality of a fresh
partition, a filtered-out day, or a first incremental run. Operators that
collect driver-side state (k-means centroids, bloom bitmaps, CC
convergence counts) are the likely crash sites; this smoke pins all 78
against it at once.
"""

from __future__ import annotations

import pytest

from retail_sales_etl_pipeline_spark.plans.registry import load_all
from retail_sales_etl_pipeline_spark.sources import TABLE_NAMES, load_table

from .conftest import SMOKE_SF_DIR

REGISTRY = load_all()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLE_NAMES:
        load_table(spark, SMOKE_SF_DIR, t).limit(0).coalesce(1).write.parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    df = REGISTRY[name].spark_fn(spark, empty_sf_dir)
    assert df.count() >= 0
    assert df.columns  # schema still resolvable
