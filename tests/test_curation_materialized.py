"""Stage-materialized curation: result equality with the lazy plan, and
PROOF (via a row accumulator on the MinHash Arrow pass) that
materialization executes the signature stage exactly once, where the lazy
multi-consumer plan re-executes it.
"""

from __future__ import annotations

from retail_sales_etl_pipeline_spark.plans.curation_queries import curate

SF = "/root/testdata/sf0.001"


def _n_docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").count()


def test_materialized_equals_lazy(spark, tmp_path):
    lazy = {tuple(r) for r in curate(spark, SF).collect()}
    mat = {
        tuple(r)
        for r in curate(spark, SF, materialize_dir=str(tmp_path / "stages")).collect()
    }
    assert mat == lazy
    assert len(mat) > 0


def test_signature_stages_execute_once_when_materialized(spark, tmp_path):
    """The counter probes BOTH Arrow signature passes (fingerprint inside
    the survivors stage, MinHash inside the candidates stage). Materialized
    curation must run each exactly once: 2n rows total. The lazy plan's
    multi-consumer ``survivors`` subtree re-executes the fingerprint pass
    per consumer (the MinHash self-join is saved by ReusedExchange), so it
    counts strictly more — the cost materialization removes."""
    n = _n_docs(spark)

    acc = spark.sparkContext.accumulator(0)
    curate(spark, SF, materialize_dir=str(tmp_path / "s2"), row_counter=acc).collect()
    assert acc.value == 2 * n  # each stage saw each document exactly once

    acc2 = spark.sparkContext.accumulator(0)
    curate(spark, SF, row_counter=acc2).collect()
    assert acc2.value > 2 * n  # lazy re-execution is real
