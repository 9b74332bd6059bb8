"""Value-checking tests for the round-7 wave (q238-q240): each query's
CLAIMED property is verified independently of the DuckDB oracle (the
oracle proves cross-engine agreement; these prove the math).
"""

from __future__ import annotations

import math

from retail_sales_etl_pipeline_spark.functions.scalar import POLY_BASE, POLY_MOD
from retail_sales_etl_pipeline_spark.plans import event_queries as eq
from retail_sales_etl_pipeline_spark.plans import mixing_queries as mq
from retail_sales_etl_pipeline_spark.plans import search_queries as srq
from retail_sales_etl_pipeline_spark.sources import load_table

from .conftest import SMOKE_SF_DIR


def tdiv(a: int, b: int) -> int:
    """SQL div: integer division truncating toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def poly_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * POLY_BASE + ord(ch)) % POLY_MOD
    return acc


def test_weighted_reservoir_matches_direct(spark):
    """q238 == direct A-ES recomputation: deterministic u from the salted
    content hash, ln in the shared micro-nat fixed point, truncating
    integer division by the char weight, top-k with doc_id tiebreak."""
    docs = (
        load_table(spark, SMOKE_SF_DIR, "documents")
        .filter("text IS NOT NULL")
        .select("doc_id", "n_chars", "text")
        .collect()
    )
    keyed = []
    for r in docs:
        u_ppm = (mq.RES_SALT_A * poly_hash(r.text) + mq.RES_SALT_B) % 1000000 + 1
        lnu_micro = math.floor(math.log(u_ppm / 1000000.0) * 1000000.0 + 0.5)
        key = tdiv(lnu_micro * 1000000, max(int(r.n_chars), 1))
        keyed.append((key, r.doc_id, int(r.n_chars)))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    want = keyed[: mq.RES_K]
    got = (
        mq.q238_weighted_reservoir_sample(spark, SMOKE_SF_DIR)
        .orderBy("rnk")
        .collect()
    )
    assert len(got) == mq.RES_K
    assert [(r.key_nano, r.doc_id, r.n_chars) for r in got] == want
    assert [r.rnk for r in got] == list(range(1, mq.RES_K + 1))
    # weighting works: P(select) ~ n_chars, so the sample must skew long
    mean_all = sum(k[2] for k in keyed) / len(keyed)
    mean_sample = sum(r.n_chars for r in got) / len(got)
    assert mean_sample > mean_all * 1.05


def test_rag_chunks_match_direct(spark):
    """q239 == direct chunking: stride starts, window slices, tail chunks
    kept with their true length, polynomial fp of the joined tokens."""
    docs = (
        load_table(spark, SMOKE_SF_DIR, "documents")
        .filter("text IS NOT NULL AND length(text) > 0")
        .select("doc_id", "text")
        .collect()
    )
    want = {}
    for r in docs:
        toks = r.text.split(" ")
        n = len(toks)
        for i in range(0, (n - 1) // srq.RAG_CHUNK_STRIDE + 1):
            s = i * srq.RAG_CHUNK_STRIDE
            chunk = toks[s : s + srq.RAG_CHUNK_TOKENS]
            want[(r.doc_id, i)] = (s, len(chunk), poly_hash(" ".join(chunk)))
    rows = srq.q239_rag_chunks(spark, SMOKE_SF_DIR).collect()
    got = {
        (r.doc_id, r.chunk_idx): (r.start_pos, r.chunk_len, r.chunk_fp)
        for r in rows
    }
    assert got == want
    # every chunk starts on a stride boundary and tail chunks are short
    assert all(s % srq.RAG_CHUNK_STRIDE == 0 for s, _, _ in got.values())
    assert any(ln < srq.RAG_CHUNK_TOKENS for _, ln, _ in got.values())


def test_histogram_quantile_merge_identity(spark):
    """q240: merged-shard quantiles == direct quantiles == a direct
    Python recomputation of the bucketed CDF rule."""
    from collections import Counter

    vals = [
        r.value
        for r in load_table(spark, SMOKE_SF_DIR, "events")
        .select("value")
        .collect()
    ]
    hist = Counter(math.floor(v * 100.0) for v in vals)
    n = sum(hist.values())
    want = {}
    for ppm in eq.QTL_PPM:
        cum = 0
        for b in sorted(hist):
            cum += hist[b]
            if 1000000 * cum >= ppm * n:
                want[ppm] = b
                break
    rows = eq.q240_histogram_quantile_merge(spark, SMOKE_SF_DIR).collect()
    assert len(rows) == len(eq.QTL_PPM)
    for r in rows:
        assert r.merge_identity_holds == 1
        assert r.merged_bucket_centi == r.direct_bucket_centi == want[r.ppm]
    # quantiles are ordered
    byppm = {r.ppm: r.merged_bucket_centi for r in rows}
    assert byppm[500000] <= byppm[900000] <= byppm[990000]
