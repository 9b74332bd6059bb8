"""Value-checking tests for the round-6 query wave (q202-q209): each
query's CLAIMED property is verified independently of the DuckDB oracle
(the oracle proves cross-engine agreement; these prove the math).
"""

from __future__ import annotations

import numpy as np
import pytest

from retail_sales_etl_pipeline_spark.plans import dedup_queries as dq
from retail_sales_etl_pipeline_spark.plans import mixing_queries as mq
from retail_sales_etl_pipeline_spark.plans import similarity_queries as sq
from retail_sales_etl_pipeline_spark.plans import text_queries as tq
from retail_sales_etl_pipeline_spark.sources import load_table

from .conftest import SMOKE_SF_DIR


def test_gram_matches_numpy(spark):
    """q202's distributed partial-Gram == one-shot numpy on the same
    quantized matrix, including sums, count, and covariance numerator."""
    emb = load_table(spark, SMOKE_SF_DIR, "embeddings")
    X = np.vstack(
        [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
    )
    Q = np.floor(X * sq.GRAM_SCALE + 0.5).astype(np.int64)
    G = Q.T @ Q
    S = Q.sum(axis=0)
    n = Q.shape[0]
    got = {
        (r.i, r.j): r
        for r in sq.q202_embedding_gram(spark, SMOKE_SF_DIR).collect()
    }
    d = Q.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), r in got.items():
        assert r.n_vecs == n
        assert r.gram_centi2 == G[i - 1, j - 1]
        assert r.s_i == S[i - 1] and r.s_j == S[j - 1]
        assert r.cov_num == n * G[i - 1, j - 1] - S[i - 1] * S[j - 1]


def test_power_iteration_matches_integer_recurrence(spark):
    """q203's output == an independent numpy simulation of the IDENTICAL
    integer recurrence (normalize-by-max, matvec, renormalize), exact to
    the last unit — and each step strictly increases the Rayleigh
    quotient, the property that makes the step a PCA solver."""
    rows = sq.q203_pca_power_iteration(spark, SMOKE_SF_DIR).collect()
    emb = load_table(spark, SMOKE_SF_DIR, "embeddings")
    X = np.vstack(
        [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
    )
    Q = np.floor(X * sq.GRAM_SCALE + 0.5).astype(np.int64)
    G = Q.T @ Q
    # trunc-toward-zero division on int64 (numpy // floors; match SQL div)
    tdiv = lambda a, b: (np.sign(a) * (np.abs(a) // b)).astype(np.int64)  # noqa: E731
    Gn = tdiv(G * 1_000_000, np.abs(G).max())
    v = np.full(G.shape[0], 1_000_000, dtype=np.int64)
    for _ in range(sq.POWER_ITERS):
        u = Gn @ v
        # overflow guard: no intermediate may exceed int64 (the reason
        # renormalization divides u rather than multiplying it by 1e6)
        assert np.abs(u).max() < 2**62
        v = tdiv(u, max(np.abs(u).max() // 1_000_000, 1))
    got_v = {r.i: r.eig_micro for r in rows}
    got_u = {r.i: r.iterate_raw for r in rows}
    assert got_v == {i + 1: int(v[i]) for i in range(len(v))}
    assert got_u == {i + 1: int(u[i]) for i in range(len(u))}


def test_winnowing_guarantee(spark):
    """Any two docs sharing a token run of length >= k + w - 1 share at
    least one selected fingerprint: exact-duplicate docs (same text) must
    therefore appear as a pair with overlap_ppm == 1000000."""
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    dup = (
        docs.groupBy("text")
        .count()
        .filter("count > 1")
        .join(docs, "text")
        .select("doc_id", "text")
        .collect()
    )
    by_text = {}
    for r in dup:
        if len(r.text.split(" ")) >= dq.WINNOW_K + dq.WINNOW_W - 1:
            by_text.setdefault(r.text, []).append(r.doc_id)
    expect = {
        (min(ids), max(ids)) for ids in by_text.values() if len(ids) >= 2
    }
    got = {
        (r.doc_a, r.doc_b): r.overlap_ppm
        for r in dq.q204_winnowing_fingerprints(spark, SMOKE_SF_DIR).collect()
    }
    for pair in expect:
        assert pair in got and got[pair] == 1_000_000


def test_prefix_filter_exact_recall(spark):
    """q205 == brute-force all-pairs distinct-token-TRIGRAM Jaccard >=
    0.3 at smoke scale — the zero-recall-loss claim, verified against
    an O(n^2) python recompute."""
    docs = load_table(spark, SMOKE_SF_DIR, "documents").collect()
    sets = {}
    for r in docs:
        t = r.text.lower().split(" ")
        if len(t) >= 3:
            sets[r.doc_id] = {
                " ".join(t[i : i + 3]) for i in range(len(t) - 2)
            }
    want = {}
    ids = sorted(sets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if dq.PF_JACCARD_DEN * inter >= dq.PF_JACCARD_NUM * union:
                want[(a, b)] = (inter, union)
    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.n_union)
        for r in dq.q205_prefix_filter_pairs(spark, SMOKE_SF_DIR).collect()
    }
    assert got == want


def test_systematic_resample_properties(spark):
    """Multiplicities sum to exactly RESAMPLE_N and each is within 1 of
    its real-valued expectation n*w_i/W (the minimum-variance claim)."""
    rows = mq.q206_systematic_resample(spark, SMOKE_SF_DIR).collect()
    docs = load_table(spark, SMOKE_SF_DIR, "documents").collect()
    w = {r.doc_id: len(r.text.split(" ")) for r in docs if r.text is not None}
    total = sum(w.values())
    assert sum(r.multiplicity for r in rows) == mq.RESAMPLE_N
    mult = {r.doc_id: r.multiplicity for r in rows}
    for doc_id, wi in w.items():
        expect = mq.RESAMPLE_N * wi / total
        assert abs(mult.get(doc_id, 0) - expect) < 1.0 + 1e-9


def test_kappa_matches_direct(spark):
    """kappa_ppm == floor of the textbook (po-pe)/(1-pe) computed from
    the q147 confusion matrix."""
    conf = tq.q147_lang_id_confusion(spark, SMOKE_SF_DIR).collect()
    n = sum(r.n_docs for r in conf)
    agree = sum(r.n_docs for r in conf if r.labeled_lang == r.predicted_lang)
    rowm: dict[str, int] = {}
    colm: dict[str, int] = {}
    for r in conf:
        rowm[r.labeled_lang] = rowm.get(r.labeled_lang, 0) + r.n_docs
        colm[r.predicted_lang] = colm.get(r.predicted_lang, 0) + r.n_docs
    pe_num = sum(rowm[c] * colm.get(c, 0) for c in rowm)
    want = int(np.floor((n * agree - pe_num) * 1_000_000.0 / (n * n - pe_num)))
    [row] = tq.q207_lang_id_kappa(spark, SMOKE_SF_DIR).collect()
    assert (row.n_docs, row.n_agree, int(row.pe_num)) == (n, agree, pe_num)
    assert row.kappa_ppm == want


def test_kcore_is_fixed_point(spark):
    """After KCORE_ROUNDS peeling rounds every surviving node has degree
    >= K (one more round would change nothing) — the convergence claim
    behind the fixed-round contract."""
    rows = dq.q208_kcore_decomposition(spark, SMOKE_SF_DIR).collect()
    assert all(r.core_deg >= dq.KCORE_K for r in rows)
    # and the survivors' edges all stay inside the survivor set, so the
    # next peel removes nothing: recompute degrees from the checkpoint
    pairs = dq._materialized_pairs(spark, SMOKE_SF_DIR).collect()
    nodes = {r.doc_id for r in rows}
    deg = {n: 0 for n in nodes}
    for p in pairs:
        if p.doc_a in nodes and p.doc_b in nodes:
            deg[p.doc_a] += 1
            deg[p.doc_b] += 1
    got = {r.doc_id: r.core_deg for r in rows}
    assert got == deg


def test_assortativity_matches_numpy(spark):
    """assortativity_ppm == floor of numpy's Pearson r over endpoint
    degrees (both-directions edge list), and sits in [-1, 1]."""
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dq._materialized_pairs(spark, SMOKE_SF_DIR).collect()
    ]
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in pairs:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    x = np.array(xs, dtype=np.int64)
    y = np.array(ys, dtype=np.int64)
    m = len(x)
    num = m * int((x * y).sum()) - int(x.sum()) ** 2
    den = m * int((x * x).sum()) - int(x.sum()) ** 2
    want = int(np.floor(num * 1_000_000.0 / den)) if den else None
    [row] = dq.q209_degree_assortativity(spark, SMOKE_SF_DIR).collect()
    assert row.n_directed_edges == m
    assert row.assortativity_ppm == want
    if want is not None:
        assert -1_000_000 <= row.assortativity_ppm <= 1_000_000
