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


# ---------------------------------------------------------------------------
# Cross-dialect hash primitives: every dedup/sampling/mixing operator keys
# on poly_hash_pair's integers, so Spark-expr == DuckDB-expr == a plain
# Python reimplementation must hold for ADVERSARIAL strings (quotes,
# unicode, separators, empties), not just the synthetic corpus.
# ---------------------------------------------------------------------------


def _py_poly_hash(s: str, base: int, mod: int) -> int:
    acc = 0
    for ch in s:
        acc = (acc * base + ord(ch)) % mod
    return acc


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"
            ),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_poly_hash_cross_dialect_equality(spark, duck, texts):
    import pandas as pd

    from retail_sales_etl_pipeline_spark.functions.scalar import (
        POLY_BASE,
        POLY_MOD,
    )
    from retail_sales_etl_pipeline_spark.operators.text import poly_hash_pair

    expect = {t: _py_poly_hash(t, POLY_BASE, POLY_MOD) for t in texts}

    sp_expr, du_expr = poly_hash_pair("text", "text")
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    got_spark = {
        r["text"]: r["h"] for r in sdf.selectExpr("text", f"{sp_expr} AS h").collect()
    }

    duck.register("hash_probe", pd.DataFrame({"text": texts}))
    got_duck = {
        t: h
        for t, h in duck.execute(
            f"SELECT text, {du_expr} AS h FROM hash_probe"
        ).fetchall()
    }
    duck.unregister("hash_probe")

    for t in texts:
        assert got_spark[t] == expect[t], repr(t)
        assert got_duck[t] == expect[t], repr(t)
