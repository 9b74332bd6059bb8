"""Parquet small-file compaction: row-set preservation, file-count
reduction, idempotence, and the no-op guard on already-compact tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.operators.compact import compact_parquet
from retail_sales_etl_pipeline_spark.sources import load_table

from .conftest import SMOKE_SF_DIR


def _rows(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(path).collect())


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    # fragment: 64 files for a tiny table
    load_table(spark, SMOKE_SF_DIR, "orders").repartition(64).write.parquet(path)
    before = _rows(spark, path)

    res = compact_parquet(spark, path, target_bytes=1 << 30)
    assert res.compacted
    assert res.files_before == 64
    assert res.files_after == 1  # whole table well under a gigabyte
    assert _rows(spark, path) == before

    # idempotent: a second call is a no-op, nothing rewritten
    res2 = compact_parquet(spark, path, target_bytes=1 << 30)
    assert not res2.compacted
    assert res2.files_before == res2.files_after == 1
    assert _rows(spark, path) == before


def test_compact_respects_target_size(spark, tmp_path):
    path = str(tmp_path / "sized")
    load_table(spark, SMOKE_SF_DIR, "lineitem").repartition(32).write.parquet(path)
    total = sum(
        f.stat().st_size
        for f in (tmp_path / "sized").iterdir()
        if f.name.endswith(".parquet")
    )
    # target a quarter of the table per file -> expect ~4 output files
    res = compact_parquet(spark, path, target_bytes=max(total // 4, 1))
    assert res.compacted
    assert 2 <= res.files_after <= 6
    assert res.files_after < res.files_before


def test_compact_noop_within_tolerance(spark, tmp_path):
    path = str(tmp_path / "ok")
    load_table(spark, SMOKE_SF_DIR, "region").coalesce(1).write.parquet(path)
    res = compact_parquet(spark, path, target_bytes=1 << 30)
    assert not res.compacted
    assert res.files_before == res.files_after == 1


def test_compact_after_appends(spark, tmp_path):
    """The scheduler pattern: append-heavy table compacted in place, late
    readers see the union of all appends exactly once."""
    path = str(tmp_path / "appends")
    base = load_table(spark, SMOKE_SF_DIR, "events").limit(100)
    for k in range(5):
        base.withColumn("batch", F.lit(k)).write.mode("append").parquet(path)
    before = _rows(spark, path)
    res = compact_parquet(spark, path, target_bytes=1 << 30)
    assert res.compacted
    assert res.files_after == 1
    assert _rows(spark, path) == before
