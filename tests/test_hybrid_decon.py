"""Value-level checks for q89 (hybrid RRF retrieval) and q90 (semantic
decontamination). Both are hash-checked against their DuckDB oracles;
these tests add an INDEPENDENT numpy/python recomputation so a dialect
quirk shared by both SQL engines can't hide, and pin the semantic
contracts (RRF arithmetic, fusion monotonicity, cross-set pairing rules).
"""

from __future__ import annotations

import numpy as np
import pytest

from retail_sales_etl_pipeline_spark.plans.mixing_queries import (
    DECON_SEM_COS,
    SEM_K,
    q90_semantic_decontamination,
)
from retail_sales_etl_pipeline_spark.plans.search_queries import (
    HYBRID_QUERY_VEC,
    HYBRID_TOP_K,
    RRF_K,
    RRF_POOL,
    q89_hybrid_rrf_retrieval,
)

SF = "/root/testdata/sf0.001"


def _embeddings(spark):
    return {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }


def test_hybrid_rrf_arithmetic_and_vector_pool(spark):
    rows = q89_hybrid_rrf_retrieval(spark, SF).collect()
    assert 0 < len(rows) <= HYBRID_TOP_K

    # RRF score is exactly determined by the two reported ranks
    for r in rows:
        want = (1.0 / (RRF_K + r.r_text) if r.r_text > 0 else 0.0) + (
            1.0 / (RRF_K + r.r_vec) if r.r_vec > 0 else 0.0
        )
        assert r.rrf == pytest.approx(want, abs=0)
        assert 0 <= r.r_text <= RRF_POOL
        assert 0 <= r.r_vec <= RRF_POOL
        assert r.r_text > 0 or r.r_vec > 0

    # output is sorted by (rrf desc, doc_id)
    key = [(-r.rrf, r.doc_id) for r in rows]
    assert key == sorted(key)

    # the vector-side ranks match a brute-force numpy ranking
    emb = _embeddings(spark)
    q = emb[HYBRID_QUERY_VEC]
    cos = {
        vid: float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q)))
        for vid, v in emb.items()
        if vid != HYBRID_QUERY_VEC
    }
    order = sorted(cos, key=lambda vid: (-cos[vid], vid))[:RRF_POOL]
    vec_rank = {vid: i + 1 for i, vid in enumerate(order)}
    for r in rows:
        assert r.r_vec == vec_rank.get(r.doc_id, 0)

    # fusion favors docs found by both systems: any doc with both ranks
    # positive must outscore any doc retrieved by one system at its best
    # possible remaining rank... pin the simplest form: both-system docs
    # with ranks <= p beat single-system docs with rank >= p
    both = [r for r in rows if r.r_text > 0 and r.r_vec > 0]
    single = [r for r in rows if (r.r_text == 0) != (r.r_vec == 0)]
    for b in both:
        p = max(b.r_text, b.r_vec)
        for s in single:
            if max(s.r_text, s.r_vec) >= p:
                assert b.rrf > s.rrf


def test_semantic_decontamination_matches_numpy(spark):
    emb = _embeddings(spark)

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    cents = {i: emb[i] for i in range(SEM_K)}
    assign = {}
    for vid, v in emb.items():
        best = sorted(((cos(v, c), -cid) for cid, c in cents.items()), reverse=True)[0]
        assign[vid] = -best[1]

    expected = set()
    for bvid, bv in emb.items():
        if bvid % 20 != 0:
            continue
        for tvid, tv in emb.items():
            if tvid % 20 == 0:
                continue
            if assign[bvid] == assign[tvid] and cos(emb[bvid], tv) >= DECON_SEM_COS:
                expected.add((bvid, tvid))

    got_rows = q90_semantic_decontamination(spark, SF).collect()
    got = {(r.bench_vec, r.train_vec) for r in got_rows}
    # caps are a no-op at this SF (clusters are small), so the sets match
    # exactly; cosine tolerance absorbs np.dot vs index-ordered fold ulps
    assert got == expected
    assert got, "testdata should contain semantic contamination pairs"
    for r in got_rows:
        assert r.centroid_id == assign[r.bench_vec] == assign[r.train_vec]
        assert r.cosine >= DECON_SEM_COS
        assert r.cosine == pytest.approx(cos(emb[r.bench_vec], emb[r.train_vec]), rel=1e-9)
        assert r.bench_vec % 20 == 0 and r.train_vec % 20 != 0
