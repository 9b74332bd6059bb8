"""Incremental connected components (q157): merging a batch into the
prior component state must equal the from-scratch clustering, and the
merge step must do contracted-graph work (few rounds, collapsed nodes),
not a full re-iteration.
"""

from __future__ import annotations

from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
    INCR_CC_MOD,
    INCR_CC_REM,
    q60_neardup_components,
    q157_incremental_components,
)

SF = "/root/testdata/sf0.001"


def test_incremental_equals_full_recompute(spark):
    inc = {
        (r.doc_id, r.component_id)
        for r in q157_incremental_components(spark, SF).collect()
    }
    full = {
        (r.doc_id, r.component_id)
        for r in q60_neardup_components(spark, SF).collect()
    }
    assert inc == full
    assert inc  # non-empty


def test_batch_actually_merges_components(spark):
    """The planted near-dup structure must put at least one NEW doc into
    a component with an OLD doc — otherwise the contracted-merge path is
    never exercised and the equality above is vacuous."""
    rows = q157_incremental_components(spark, SF).collect()
    by_comp: dict[int, set[bool]] = {}
    for r in rows:
        by_comp.setdefault(r.component_id, set()).add(
            r.doc_id % INCR_CC_MOD == INCR_CC_REM
        )
    mixed = [c for c, kinds in by_comp.items() if kinds == {True, False}]
    assert mixed, "no component spans the old/new boundary at sf0.001"
