"""Property-based tests (SURVEY §5.3-4): hypothesis-generated staging rows
must satisfy the cleaning/upsert invariants for ANY input, not just the
fixture."""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.operators.clean import clean_staging
from retail_sales_etl_pipeline_spark.operators.dims import (
    upsert_new_wins,
    upsert_old_wins,
)

# Small row universe: overlapping keys are what exercise dedup/upserts.
_invoice = st.sampled_from(["A1", "A2", "A3", None])
_stock = st.sampled_from(["P1", "P2", None])
_qty = st.sampled_from([None, -5, 0, 1, 7])
_ts = st.sampled_from([datetime(2011, 3, 1, 10, 0), datetime(2011, 3, 2, 11, 30), None])
_price = st.sampled_from([None, Decimal("-1.00"), Decimal("0.00"), Decimal("2.50")])
_cust = st.sampled_from(["17850.0", None])

_staging_rows = st.lists(
    st.tuples(_invoice, _stock, st.just("D"), _qty, _ts, _price, _cust, st.just("UK")),
    min_size=0,
    max_size=25,
)

_SCHEMA = (
    "invoice_no string, stock_code string, description string, quantity int, "
    "invoice_date timestamp, unit_price decimal(10,2), customer_id string, "
    "country string"
)


def _mk(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    return df.withColumn("load_seq", F.monotonically_increasing_id())


@pytest.mark.parametrize("dummy", [0])  # keep pytest collection flat
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_staging_rows)
def test_clean_invariants(spark, dummy, rows):
    cleaned = clean_staging(_mk(spark, rows), collect_metrics=False).df.cache()
    out = cleaned.collect()
    # no NULLs in required columns, no zero qty, no non-positive price
    for r in out:
        assert r["invoice_no"] is not None and r["stock_code"] is not None
        assert r["quantity"] is not None and r["quantity"] != 0
        assert r["invoice_date"] is not None
        assert r["unit_price"] is not None and r["unit_price"] > 0
    # idempotence: cleaning cleaned data removes nothing
    again = clean_staging(cleaned, collect_metrics=False).df
    assert again.count() == len(out)
    # dedup key uniqueness (6-col key with coalesced customer)
    keys = [
        (r["invoice_no"], r["stock_code"], r["quantity"], r["invoice_date"],
         r["unit_price"], r["customer_id"] or "")
        for r in out
    ]
    assert len(keys) == len(set(keys))
    cleaned.unpersist()


_dim_rows = st.lists(
    st.tuples(st.sampled_from(["K1", "K2", "K3", "K4"]), st.integers(0, 9)),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],
)


@pytest.mark.parametrize("dummy", [0])
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(old=_dim_rows, new=_dim_rows)
def test_upsert_properties(spark, dummy, old, new):
    o = spark.createDataFrame(old, "k string, v int")
    n = spark.createDataFrame(new, "k string, v int")
    nw = {r["k"]: r["v"] for r in upsert_new_wins(o, n, "k").collect()}
    ow = {r["k"]: r["v"] for r in upsert_old_wins(o, n, "k").collect()}
    od, nd = dict(old), dict(new)
    # M1 new-wins: union of keys, new value on conflict
    assert nw == {**od, **nd}
    # M2 old-wins: union of keys, old value on conflict
    assert ow == {**nd, **od}
    # idempotence: applying the same new twice changes nothing
    twice = {
        r["k"]: r["v"]
        for r in upsert_new_wins(
            upsert_new_wins(o, n, "k"), n, "k"
        ).collect()
    }
    assert twice == nw
