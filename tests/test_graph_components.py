"""Connected-components operator semantics: the transitive rung of the
dedup ladder (q60/q61/q66). The registry queries are DuckDB-oracle-checked
at sf0.01; these tests pin the CHAIN semantics explicitly (a test-scale
corpus may contain no A~B~C chain where greedy and transitive disagree),
prove the large-star/small-star form equals min-label propagation on random
graphs, and assert the star form's O(log n) round count on the worst case
for propagation (a path graph).
"""

from __future__ import annotations

import math
import random

import pytest

from retail_sales_etl_pipeline_spark.operators.graph import connected_components

ALGOS = ["star", "label"]


def _cc(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    edges = spark.createDataFrame(
        edge_pairs or [], "src long, dst long"
    ) if edge_pairs else spark.createDataFrame([], "src long, dst long")
    out = connected_components(nodes, edges, **kw).collect()
    return {r["id"]: r["component_id"] for r in out}


def _reference_cc(node_ids, edge_pairs):
    """Driver-side union-find oracle for the equivalence tests."""
    parent = {i: i for i in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # roots union by min, so find(i) IS the min id of i's component
    return {i: find(i) for i in node_ids}


@pytest.mark.parametrize("algo", ALGOS)
def test_chain_collapses_to_min_id(spark, algo):
    """A~B and B~C (no direct A~C edge): all three land in ONE component
    labeled min(A,B,C) — exactly what greedy pair-drop gets wrong."""
    labels = _cc(spark, [1, 2, 3, 9], [(1, 2), (2, 3)], algorithm=algo)
    assert labels == {1: 1, 2: 1, 3: 1, 9: 9}
    keep = {i for i, c in labels.items() if i == c}
    assert keep == {1, 9}  # one canonical doc per component


@pytest.mark.parametrize("algo", ALGOS)
def test_long_chain_and_direction_independence(spark, algo):
    # 10-node path given in arbitrary edge directions; min id in middle
    edges = [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0), (5, 6), (7, 6), (7, 8), (9, 8)]
    labels = _cc(spark, list(range(10)), edges, algorithm=algo)
    assert set(labels.values()) == {0}


@pytest.mark.parametrize("algo", ALGOS)
def test_disjoint_components_and_singletons(spark, algo):
    labels = _cc(spark, [1, 2, 3, 4, 5, 6], [(2, 1), (4, 3)], algorithm=algo)
    assert labels == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 6}


@pytest.mark.parametrize("algo", ALGOS)
def test_unconverged_raises(spark, algo):
    with pytest.raises(RuntimeError, match="not converged"):
        _cc(spark, list(range(6)), [(i, i + 1) for i in range(5)],
            max_iters=1, algorithm=algo, small_graph_max_edges=0)


def test_star_equals_label_on_random_graphs(spark):
    """The production (star) and reference (label) forms — and a
    driver-side union-find — agree bit-for-bit on random graphs."""
    rng = random.Random(42)
    for trial in range(3):
        n = 40
        nodes = list(range(n))
        n_edges = rng.randrange(0, 60)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        expect = _reference_cc(nodes, edges)
        # force the distributed star iteration (the default would take
        # the small-graph driver cutover at this size)
        star = _cc(
            spark, nodes, edges, algorithm="star", small_graph_max_edges=0
        )
        label = _cc(spark, nodes, edges, algorithm="label")
        driver = _cc(spark, nodes, edges, algorithm="star")
        assert star == expect, f"star diverged on trial {trial}"
        assert label == expect, f"label diverged on trial {trial}"
        assert driver == expect, f"driver cutover diverged on trial {trial}"


def test_star_round_count_logarithmic_on_chain(spark):
    """A 64-node path: min-label propagation needs ~diameter (63) rounds;
    the star form must stay within log2(n) + c. This is the 100 TB
    argument — duplicate chains of depth d cost d shuffles under
    propagation but only O(log d) under star contraction."""
    n = 64
    stats: dict = {}
    labels = _cc(
        spark, list(range(n)), [(i, i + 1) for i in range(n - 1)],
        algorithm="star", stats=stats, small_graph_max_edges=0,
    )
    assert set(labels.values()) == {0}
    assert stats["rounds"] <= int(math.log2(n)) + 4, stats


def test_star_stats_and_empty_edges(spark):
    stats: dict = {}
    labels = _cc(
        spark, [7, 8], [], algorithm="star", stats=stats,
        small_graph_max_edges=0,
    )
    assert labels == {7: 7, 8: 8}
    assert stats == {"rounds": 1, "algorithm": "star"}


def test_small_graph_cutover_stats_and_labels(spark):
    """The default path below CC_SMALL_GRAPH_MAX_EDGES is the driver
    union-find: same labels as the star fixpoint, observable via stats
    (the no-silent-iteration rule), singletons never collected."""
    stats: dict = {}
    labels = _cc(
        spark, [1, 2, 3, 9], [(1, 2), (2, 3)], algorithm="star",
        stats=stats,
    )
    assert labels == {1: 1, 2: 1, 3: 1, 9: 9}
    assert stats == {
        "rounds": 0,
        "algorithm": "star+driver-small-graph",
        "n_edges": 2,
    }
