"""The scored verification report (tools/verify_warehouse.py) over a built
warehouse: all checks pass on a healthy load, layout failures are surfaced,
and the exit-code scoring follows the reference's 100%/70% thresholds."""

from __future__ import annotations

import pytest

from retail_sales_etl_pipeline_spark.plans import retail_pipeline

from .retail_fixture import fixture_path


@pytest.fixture(scope="module")
def built_warehouse(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("verify_wh")
    csv_path, _ = fixture_path(str(tmp))
    wh = str(tmp / "warehouse")
    retail_pipeline.run(spark, csv_path, wh, min_rows=10)
    return wh


def test_healthy_warehouse_all_pass(spark, built_warehouse):
    from tools.verify_warehouse import run_verification

    rep = run_verification(spark, built_warehouse)
    assert rep.checks == {
        "Warehouse Layout": True,
        "Staging Table": True,
        "Warehouse Tables": True,
        "Data Freshness": True,
        "Data Quality": True,
    }
    assert rep.exit_code == 0
    assert "ALL CHECKS PASSED" in rep.text
    # report carries the reference's substance: stats, RI, consistency
    for needle in (
        "Unique Invoices",
        "orphan fact keys",
        # the fixture deliberately loses ~29% of rows to cleaning, so the
        # consistency probe reports the difference rather than "consistent"
        "This may be normal if data was cleaned/filtered",
        "Results: 5/5 checks passed",
    ):
        assert needle in rep.text, needle


def test_missing_warehouse_fails_loudly(spark, tmp_path):
    from tools.verify_warehouse import run_verification

    rep = run_verification(spark, str(tmp_path / "empty_wh"))
    assert rep.checks["Warehouse Layout"] is False
    assert rep.exit_code == 2
    assert "MULTIPLE FAILURES" in rep.text


def test_exit_code_partial_threshold():
    from tools.verify_warehouse import Report

    rep = Report(checks={"a": True, "b": True, "c": True, "d": True, "e": False})
    assert rep.exit_code == 1  # 4/5 = 80% >= 70%
    rep2 = Report(checks={"a": True, "b": False, "c": False, "d": False, "e": False})
    assert rep2.exit_code == 2
