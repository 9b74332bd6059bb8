from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_sales_etl_pipeline_spark.session import get_spark  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Small shuffle-partition count: test tables are tiny and 200 (or even
    # 32) partitions would be pure scheduling overhead.
    return get_spark("tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SMOKE_SF_DIR}/{t}.parquet')"
        )
    return con
