"""Registry robustness: a broken query module must fail loudly, never
silently shrink the query surface (VERDICT r1 'What's wrong' #2)."""

from __future__ import annotations

import pytest

from retail_sales_etl_pipeline_spark.plans import registry


def test_load_all_registers_full_surface():
    qs = registry.load_all()
    assert len(qs) >= 43
    # spot-check one query per module family
    for name in (
        "q01_clean_filters",
        "q20_dedup_exact",
        "q30_ann_bruteforce",
        "q24_lang_id",
        "q33_event_hourly_agg",
        "q37_multimodal_features",
        "q44_percentiles",
        "q45_window_suite",
        "q48_cube_order_stats",
    ):
        assert name in qs, name


def test_catalog_tool_lists_all_and_filters():
    from tools.list_queries import catalog

    rows = catalog()
    assert len(rows) >= 54
    assert all(r["doc"] for r in rows)  # every query is documented
    dedup = catalog("dedup")
    assert 0 < len(dedup) < len(rows)
    assert all("dedup" in r["tags"] for r in dedup)
    oracle_status = {r["oracle"] for r in rows}
    assert oracle_status == {"hash-checked", "rows-only"}


def test_broken_module_fails_loudly(monkeypatch):
    monkeypatch.setattr(
        registry,
        "QUERY_MODULES",
        registry.QUERY_MODULES + ("definitely_missing_module",),
    )
    with pytest.raises(ImportError, match="definitely_missing_module"):
        registry.load_all()


def test_multiple_failures_all_reported(monkeypatch):
    monkeypatch.setattr(
        registry,
        "QUERY_MODULES",
        registry.QUERY_MODULES + ("broken_one", "broken_two"),
    )
    with pytest.raises(ImportError, match="broken_one.*broken_two"):
        registry.load_all()
