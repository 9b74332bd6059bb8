"""Round-9 additions: exact substring-span dedup (q244), DSIR importance
resampling (q245), and the level-synchronous chain-depth walk that
replaced the WITH RECURSIVE form (q188/q201).

Hash-parity with the DuckDB oracles is the primary gate (driver +
tools/check_correctness.py); these tests pin the VALUE semantics a hash
can't explain: brute-force span reconstruction, Efraimidis-Spirakis key
algebra, and the aggregated walk's equality with path enumeration on a
hand-built DAG.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
    SUBSTR_W,
    chain_depth_from_pairs,
    q244_exact_substring_spans,
)
from retail_sales_etl_pipeline_spark.plans.mixing_queries import (
    DSIR_RESAMPLE_K,
    DSIR_RS_A,
    DSIR_RS_B,
    POLY_MOD_SQL,
    _LN_1E6_MICRO,
    q158_dsir_importance_weights,
    q245_dsir_importance_resample,
)
from retail_sales_etl_pipeline_spark.sources import load_table

from .conftest import SMOKE_SF_DIR


def _brute_force_spans(rows: list) -> set[tuple]:
    """Reference implementation: hash every W-window, count occurrences
    corpus-wide, union each doc's duplicated window intervals."""
    from collections import Counter, defaultdict

    wins = defaultdict(list)  # doc_id -> [(pos, key)]
    counts: Counter = Counter()
    for doc_id, text in rows:
        toks = text.lower().split(" ")
        if len(toks) < SUBSTR_W:
            continue
        for i in range(len(toks) - SUBSTR_W + 1):
            key = " ".join(toks[i : i + SUBSTR_W])
            wins[doc_id].append((i + 1, key))
            counts[key] += 1
    spans = set()
    for doc_id, wlist in wins.items():
        dup_pos = sorted(p for p, k in wlist if counts[k] >= 2)
        if not dup_pos:
            continue
        start, last, n_win = dup_pos[0], dup_pos[0], 1
        for p in dup_pos[1:]:
            if p > last + SUBSTR_W:  # same merge rule as the query
                spans.add(
                    (doc_id, start, last + SUBSTR_W - 1,
                     last + SUBSTR_W - start, n_win)
                )
                start, n_win = p, 0
            last = p
            n_win += 1
        spans.add(
            (doc_id, start, last + SUBSTR_W - 1,
             last + SUBSTR_W - start, n_win)
        )
    return spans


def test_q244_matches_brute_force_span_reconstruction(spark):
    rows = [
        (r.doc_id, r.text)
        for r in load_table(spark, SMOKE_SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    expected = _brute_force_spans(rows)
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_dup_tokens, r.n_windows)
        for r in q244_exact_substring_spans(spark, SMOKE_SF_DIR).collect()
    }
    assert got == expected
    assert got, "smoke corpus must contain duplicated spans"


def test_q244_span_invariants(spark):
    by_doc: dict[int, list] = {}
    for r in q244_exact_substring_spans(spark, SMOKE_SF_DIR).collect():
        assert r.n_dup_tokens == r.span_end - r.span_start + 1
        assert r.n_dup_tokens >= SUBSTR_W  # a span is at least one window
        # window count bounded by the positions a span can host
        assert 1 <= r.n_windows <= r.n_dup_tokens - SUBSTR_W + 1
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    # maximality: spans within one doc are separated by >= 1 non-dup token
    for doc_id, spans in by_doc.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1, (doc_id, (s1, e1), (s2, e2))


def _l6(x: int) -> int:
    return math.floor(math.log(x) * 1e6 + 0.5)


def test_q245_key_algebra_and_rank(spark):
    rows = q245_dsir_importance_resample(spark, SMOKE_SF_DIR).collect()
    assert len(rows) == DSIR_RESAMPLE_K
    assert sorted(r.rnk for r in rows) == list(range(1, DSIR_RESAMPLE_K + 1))
    # the ES key must be exactly L(max(L(1e6)-L(u_micro),1)) - logw
    for r in rows:
        u_micro = (
            DSIR_RS_A * (r.doc_id % POLY_MOD_SQL) + DSIR_RS_B
        ) % 1_000_000 + 1
        l_micro = max(_LN_1E6_MICRO - _l6(u_micro), 1)
        assert r.key_micronat == _l6(l_micro) - r.logw_micronat, r
    # ranks follow (key asc, doc_id asc)
    ordered = sorted(rows, key=lambda r: (r.key_micronat, r.doc_id))
    assert [r.rnk for r in ordered] == list(range(1, DSIR_RESAMPLE_K + 1))


def test_q245_resample_differs_from_hard_topk(spark):
    """The point of resampling: proportional-to-weight draws keep docs a
    hard top-K would discard (diversity), while still being weight-led —
    the two selections must overlap but not coincide."""
    topk = {
        r.doc_id for r in q158_dsir_importance_weights(spark, SMOKE_SF_DIR).collect()
    }
    res = {
        r.doc_id
        for r in q245_dsir_importance_resample(spark, SMOKE_SF_DIR).collect()
    }
    assert res - topk, "resample must admit below-top-K docs"
    assert topk & res, "resample must still be weight-led"


def test_chain_depth_walk_equals_path_enumeration(spark):
    """Hand-built canonical DAG with a diamond: 1->2, 1->3, 2->3, 3->4.
    Paths from the single root 1: [1], [1,2], [1,3], [1,2,3], [1,3,4],
    [1,2,3,4] — doc 3 is reached at depths 1 and 2 (2 paths), doc 4 at
    depths 2 and 3 (2 paths)."""
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: (r.min_depth, r.max_depth, r.n_paths)
        for r in chain_depth_from_pairs(spark, pairs).collect()
    }
    assert got == {
        1: (0, 0, 1),
        2: (1, 1, 1),
        3: (1, 2, 2),
        4: (2, 3, 2),
    }


def test_chain_depth_walk_empty_pairs(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert chain_depth_from_pairs(spark, pairs).count() == 0


def test_q244_windows_shuffle_integer_sized_keys(spark):
    """Scale pin: the duplication-detection exchange must carry the
    sha256 key, never the W-token window text (32-byte vs ~150-byte
    keys at 100 TB) — the plan's window-count partition key is `h`."""
    plan_df = q244_exact_substring_spans(spark, SMOKE_SF_DIR)
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "sha2" in plan or "sha2" in plan_df._jdf.queryExecution().analyzed().toString()
