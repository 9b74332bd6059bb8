"""Connected-components operator semantics: the transitive rung of the
dedup ladder (q60/q61). The registry queries are DuckDB-oracle-checked at
sf0.01; these tests pin the CHAIN semantics explicitly, since a test-scale
corpus may contain no A~B~C chain where greedy and transitive disagree.
"""

from __future__ import annotations

import pytest

from retail_sales_etl_pipeline_spark.operators.graph import connected_components


def _cc(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    edges = spark.createDataFrame(
        edge_pairs or [], "src long, dst long"
    ) if edge_pairs else spark.createDataFrame([], "src long, dst long")
    out = connected_components(nodes, edges, **kw).collect()
    return {r["id"]: r["component_id"] for r in out}


def test_chain_collapses_to_min_id(spark):
    """A~B and B~C (no direct A~C edge): all three land in ONE component
    labeled min(A,B,C) — exactly what greedy pair-drop gets wrong."""
    labels = _cc(spark, [1, 2, 3, 9], [(1, 2), (2, 3)])
    assert labels == {1: 1, 2: 1, 3: 1, 9: 9}
    keep = {i for i, c in labels.items() if i == c}
    assert keep == {1, 9}  # one canonical doc per component


def test_long_chain_and_direction_independence(spark):
    # 10-node path given in arbitrary edge directions; min id in middle
    edges = [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0), (5, 6), (7, 6), (7, 8), (9, 8)]
    labels = _cc(spark, list(range(10)), edges)
    assert set(labels.values()) == {0}


def test_disjoint_components_and_singletons(spark):
    labels = _cc(spark, [1, 2, 3, 4, 5, 6], [(2, 1), (4, 3)])
    assert labels == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 6}


def test_unconverged_raises(spark):
    with pytest.raises(RuntimeError, match="not converged"):
        _cc(spark, list(range(6)), [(i, i + 1) for i in range(5)], max_iters=1)
