"""Golden end-to-end tests of the retail pipeline on the synthetic fixture
(FIXTURES.md §A4 invariants) plus unit tests of the known-hard semantics
(SURVEY §7.4)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.operators.clean import (
    clean_staging,
    remove_duplicates,
)
from retail_sales_etl_pipeline_spark.operators.fact import ri_violations
from retail_sales_etl_pipeline_spark.plans import retail_pipeline
from retail_sales_etl_pipeline_spark.plans.quality import DataQualityError
from retail_sales_etl_pipeline_spark.sources.retail_csv import read_retail_csv

from .retail_fixture import fixture_path


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("retail")
    csv_path, exp = fixture_path(str(tmp))
    wh = str(tmp / "warehouse")
    res = retail_pipeline.run(spark, csv_path, wh, min_rows=10)
    return spark, csv_path, wh, exp, res


def test_stage_metrics_reconcile(pipeline_run):
    _, _, _, exp, res = pipeline_run
    assert res.raw_rows == exp.raw_rows
    by_name = {m.stage_name: m for m in res.stage_metrics}
    assert by_name["remove_nulls"].rows_after == exp.after_nulls
    assert by_name["remove_duplicates"].rows_after == exp.after_dedup
    assert by_name["remove_zero_quantities"].rows_after == exp.after_zero_qty
    assert by_name["remove_invalid_prices"].rows_after == exp.after_price
    # A4.1: counts reconcile exactly
    assert res.cleaned_rows == exp.after_price


def test_fact_equals_cleaned_and_revenue_exact(pipeline_run):
    _, _, _, exp, res = pipeline_run
    # A4.2: inner joins lossless after UNKNOWN seed
    assert res.fact_rows == res.cleaned_rows
    # A4.3: exact decimal revenue
    assert Decimal(res.total_revenue) == exp.revenue


def test_dim_counts(pipeline_run):
    _, _, _, exp, res = pipeline_run
    assert res.dim_product_rows == exp.n_products
    assert res.dim_customer_rows == exp.n_customers + 1  # + UNKNOWN sentinel
    assert res.dim_date_rows == exp.n_dates


def test_negative_quantity_kept_and_ri(pipeline_run):
    spark, _, wh, _, _ = pipeline_run
    fact = spark.read.parquet(f"{wh}/fact_sales")
    # A4.5: returns kept
    assert fact.filter(F.col("quantity") < 0).count() == 1
    # A4.6: RI — every fact row joins back to each dim
    for dim, key in (
        ("dim_product", "product_key"),
        ("dim_customer", "customer_key"),
        ("dim_date", "date_key"),
    ):
        assert ri_violations(fact, spark.read.parquet(f"{wh}/{dim}"), key) == 0


def test_dedup_survivor_carries_first_description(pipeline_run):
    spark, csv_path, _, exp, _ = pipeline_run
    staged = read_retail_csv(spark, csv_path)
    deduped = remove_duplicates(staged.dropna(subset=["invoice_no"]))
    for inv, want in exp.survivor_descriptions.items():
        got = deduped.filter(F.col("invoice_no") == inv).select("description").collect()
        assert [r[0] for r in got] == [want], inv


def test_nan_customer_becomes_null_and_float_str(pipeline_run):
    spark, csv_path, _, _, _ = pipeline_run
    staged = read_retail_csv(spark, csv_path)
    nan_row = staged.filter(F.col("invoice_no") == "600000").collect()[0]
    assert nan_row["customer_id"] is None
    good = staged.filter(F.col("invoice_no") == "100000").collect()[0]
    assert good["customer_id"] == "17850.0"  # pandas float→str quirk


def test_unknown_customer_routing(pipeline_run):
    spark, _, wh, _, _ = pipeline_run
    fact = spark.read.parquet(f"{wh}/fact_sales")
    dimc = spark.read.parquet(f"{wh}/dim_customer")
    unknown_key = dimc.filter(F.col("customer_id") == "UNKNOWN").collect()[0]["customer_key"]
    # 20 baseline rows: every 4th has blank customer → 5; plus dup-survivor
    # 300001 (null cust) and the 'nan' row → 7 UNKNOWN facts
    assert fact.filter(F.col("customer_key") == unknown_key).count() == 7


def test_idempotent_rerun_preserves_surrogate_keys(spark, tmp_path):
    csv_path, _ = fixture_path(str(tmp_path))
    wh = str(tmp_path / "wh")
    r1 = retail_pipeline.run(spark, csv_path, wh, min_rows=10)
    keys1 = {
        r["stock_code"]: r["product_key"]
        for r in spark.read.parquet(f"{wh}/dim_product").collect()
    }
    r2 = retail_pipeline.run(spark, csv_path, wh, min_rows=10)
    keys2 = {
        r["stock_code"]: r["product_key"]
        for r in spark.read.parquet(f"{wh}/dim_product").collect()
    }
    assert keys1 == keys2  # SERIAL-equivalent stability (SURVEY §7.4.1)
    assert r1.fact_rows == r2.fact_rows
    assert r1.total_revenue == r2.total_revenue


def test_quality_gate_raises(spark, tmp_path):
    csv_path, _ = fixture_path(str(tmp_path))
    with pytest.raises(DataQualityError):
        retail_pipeline.run(spark, csv_path, str(tmp_path / "wh2"), min_rows=400_000)


def test_missing_csv_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        retail_pipeline.run(spark, str(tmp_path / "nope.csv"), str(tmp_path / "wh3"))


def test_clean_idempotent(spark, tmp_path):
    csv_path, _ = fixture_path(str(tmp_path))
    staged = read_retail_csv(spark, csv_path)
    once = clean_staging(staged, collect_metrics=False).df
    twice = clean_staging(once, collect_metrics=False).df
    assert once.count() == twice.count()
    assert once.exceptAll(twice).count() == 0


def test_retail_driver_records_stage_attempts(pipeline_run):
    """The retail driver runs its heavyweight stages under the default
    timeout/retry policy and records one success attempt per stage in
    both the result object and the stage_attempts parquet log."""
    spark, _, wh, _, res = pipeline_run
    assert {a.stage_name for a in res.stage_attempts} == {
        "ingest_csv", "dim_upserts", "fact_full_refresh",
    }
    assert all(a.status == "success" and a.attempt == 1
               for a in res.stage_attempts)
    logged = spark.read.parquet(f"{wh}/stage_attempts").collect()
    assert {(r.stage_name, r.attempt, r.status) for r in logged} >= {
        (a.stage_name, a.attempt, a.status) for a in res.stage_attempts
    }
