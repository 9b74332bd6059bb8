"""Value-checking tests for the round-6 waves 7-9 (q210-q225): each
query's CLAIMED property is verified independently of the DuckDB oracle
(the oracle proves cross-engine agreement; these prove the math).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from retail_sales_etl_pipeline_spark.plans import analytic_queries as aq
from retail_sales_etl_pipeline_spark.plans import dedup_queries as dq
from retail_sales_etl_pipeline_spark.plans import event_queries as eq
from retail_sales_etl_pipeline_spark.plans import similarity_queries as sq
from retail_sales_etl_pipeline_spark.plans import text_queries as tq
from retail_sales_etl_pipeline_spark.plans import tokenizer_queries as kq
from retail_sales_etl_pipeline_spark.sources import load_table

from .conftest import SMOKE_SF_DIR


def tdiv(a: int, b: int) -> int:
    """SQL div: integer division truncating toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_ann_rank_eval_matches_direct(spark):
    """q210's DCG/IDCG/nDCG/MRR == a direct Python recomputation from
    the very q30/q31 frames it grades, using the same discount table."""
    exact = {
        (r.query_id, r.neighbor_id): r.rank
        for r in sq.q30_ann_bruteforce(spark, SMOKE_SF_DIR).collect()
    }
    approx = defaultdict(list)
    for r in sq.q31_ann_ivf(spark, SMOKE_SF_DIR).collect():
        approx[r.query_id].append((r.rank, r.neighbor_id))
    got = {r.query_id: r for r in sq.q210_ann_rank_eval(spark, SMOKE_SF_DIR).collect()}

    def rel(q, n):
        gt = exact.get((q, n))
        if gt is None:
            return 0
        return 3 if gt <= 1 else (2 if gt <= 5 else 1)

    for q, items in approx.items():
        rels = [(rk, rel(q, n)) for rk, n in sorted(items)]
        dcg = sum(r * sq._DISCOUNT_MICRO[rk] for rk, r in rels)
        ideal = sorted((r for _, r in rels), reverse=True)
        idcg = sum(
            r * sq._DISCOUNT_MICRO[i + 1] for i, r in enumerate(ideal)
        )
        top1 = next(
            (rk for rk, n in sorted(items) if exact.get((q, n)) == 1), None
        )
        row = got[q]
        assert row.dcg_micro == dcg
        assert row.idcg_micro == idcg
        assert row.ndcg_ppm == (tdiv(1000000 * dcg, idcg) if idcg else None)
        assert row.rr_ppm == (tdiv(1000000, top1) if top1 else 0)
        assert row.ndcg_ppm <= 1000000


def test_adamic_adar_matches_direct(spark):
    """q211 == direct AA recomputation from q21's verified pairs with the
    identical micro-nat integer formula, including the is_linked flag."""
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dq.q21_ngram_jaccard_pairs(spark, SMOKE_SF_DIR)
        .select("doc_a", "doc_b")
        .collect()
    ]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    edge_set = set(pairs)
    want = {}
    for z, nbrs in adj.items():
        deg = len(nbrs)
        if deg < 2:  # no wedge through a degree-1 node
            continue
        inv = tdiv(10**12, int(math.floor(math.log(deg) * 1e6 + 0.5)))
        for u in nbrs:
            for v in nbrs:
                if u < v:
                    lk, c, s = want.get(
                        (u, v), (1 if (u, v) in edge_set else 0, 0, 0)
                    )
                    want[(u, v)] = (lk, c + 1, s + inv)
    got = {
        (r.doc_u, r.doc_v): (r.is_linked, r.n_common, r.aa_score_micro)
        for r in dq.q211_adamic_adar_linkpred(spark, SMOKE_SF_DIR).collect()
    }
    assert got == want
    assert len(got) > 0  # planted dups guarantee co-neighbor pairs


def test_trigram_backoff_matches_direct(spark):
    """q212 == a pure-Python stupid-backoff scorer with the identical
    integer evaluation order, per held-out doc; every backoff level
    that occurs is counted."""
    docs = {
        r.doc_id: r.text.lower().split(" ")
        for r in load_table(spark, SMOKE_SF_DIR, "documents").collect()
        if r.text is not None
    }
    c1, c2, c3 = Counter(), Counter(), Counter()
    n_tot = 0
    for d, t in docs.items():
        if d % 2 == 0:
            c1.update(t)
            n_tot += len(t)
            c2.update(zip(t, t[1:]))
            c3.update(zip(t, t[1:], t[2:]))
    want = {}
    for d, t in docs.items():
        if d % 2 == 0 or len(t) < 3:
            continue
        tot = lv = None
        sums = dict(n=0, s=0, tri=0, bi=0, uni=0, unseen=0)
        for g in zip(t, t[1:], t[2:]):
            if c3[g]:
                p, lv = tdiv(c3[g] * 10**6, c2[g[:2]]), "tri"
            elif c2[(g[1], g[2])]:
                p, lv = tdiv(4 * tdiv(c2[(g[1], g[2])] * 10**6, c1[g[1]]), 10), "bi"
            elif c1[g[2]]:
                p, lv = tdiv(16 * tdiv(c1[g[2]] * 10**6, n_tot), 100), "uni"
            else:
                p, lv = 0, "unseen"
            sums["n"] += 1
            sums["s"] += p
            sums[lv] += 1
        want[d] = sums
    got = {
        r.doc_id: r
        for r in kq.q212_trigram_backoff_lm(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(want)
    for d, w in want.items():
        g = got[d]
        assert (g.n_trigrams, g.sum_p_ppm) == (w["n"], w["s"])
        assert g.mean_p_ppm == tdiv(w["s"], w["n"])
        assert (g.n_tri_hits, g.n_bi_backoff, g.n_uni_backoff, g.n_unseen) == (
            w["tri"],
            w["bi"],
            w["uni"],
            w["unseen"],
        )
    # held-out scoring must actually exercise a backoff rung somewhere
    assert any(
        g.n_bi_backoff + g.n_uni_backoff + g.n_unseen > 0 for g in got.values()
    )


def test_hll_sketch_matches_direct(spark):
    """q213's registers and both estimators == a direct Python HLL over
    the same affine hash; the chosen estimate lands within 15% of exact
    (m=1024 at smoke-scale cardinalities => linear counting regime)."""
    ev = [
        (r.event_type, r.user_id)
        for r in load_table(spark, SMOKE_SF_DIR, "events").collect()
        if r.user_id is not None
    ]
    regs: dict[str, dict[int, int]] = defaultdict(dict)
    exact = defaultdict(set)
    for t, u in ev:
        exact[t].add(u)
        h = (eq.HLL_SALT_A * u + eq.HLL_SALT_B) % eq._HLL_MOD
        b, w = h % eq.HLL_M, h // eq.HLL_M
        rho = 21 if w == 0 else 20 - w.bit_length() + 1
        regs[t][b] = max(regs[t].get(b, 0), rho)
    got = {
        r.event_type: r
        for r in eq.q213_hll_distinct_sketch(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(regs)
    for t, rg in regs.items():
        occ = len(rg)
        zeros = eq.HLL_M - occ
        denom = zeros * (1 << 21) + sum(1 << (21 - m) for m in rg.values())
        est_hll = tdiv(tdiv(eq.HLL_ALPHA_M2_MICRO * (1 << 21), denom), 10**6)
        est_lc = (
            tdiv(
                eq.HLL_M
                * (6931472 - int(math.floor(math.log(zeros) * 1e6 + 0.5))),
                10**6,
            )
            if zeros
            else None
        )
        row = got[t]
        assert (row.occupied, row.zeros) == (occ, zeros)
        assert row.est_hll == est_hll
        assert row.est_lc == est_lc
        chosen = est_lc if (est_hll <= 2560 and zeros) else est_hll
        assert row.est_chosen == chosen
        assert row.n_exact == len(exact[t])
        assert abs(chosen - row.n_exact) <= 0.15 * row.n_exact


def test_ols_matches_numpy(spark):
    """q214's exact sums == numpy int sums; its Cramer betas == numpy
    lstsq on the centered system to float precision."""
    li = load_table(spark, SMOKE_SF_DIR, "lineitem").collect()
    x1 = np.array([int(r.l_quantity) for r in li], dtype=np.int64)
    x2 = np.array(
        [int(round(r.l_discount * 100)) for r in li], dtype=np.int64
    )
    y = np.array(
        [int(round(r.l_extendedprice * 100)) for r in li], dtype=np.int64
    )
    row = aq.q214_ols_normal_equations(spark, SMOKE_SF_DIR).collect()[0]
    assert row.n == len(li)
    assert row.sx1 == x1.sum() and row.sx2 == x2.sum() and row.sy == y.sum()
    assert row.sx1x1 == (x1 * x1).sum() and row.sx2x2 == (x2 * x2).sum()
    assert row.sx1x2 == (x1 * x2).sum()
    # y-bearing cross-moments are DECIMAL(38,0) rendered as strings
    # (round-7 overflow fix); compare in exact Python ints
    assert int(row.sx1y) == int((x1.astype(object) * y.astype(object)).sum())
    assert int(row.sx2y) == int((x2.astype(object) * y.astype(object)).sum())
    assert int(row.syy) == int((y.astype(object) * y.astype(object)).sum())
    X = np.column_stack([np.ones(len(li)), x1, x2]).astype(np.float64)
    beta = np.linalg.lstsq(X, y.astype(np.float64), rcond=None)[0]
    assert math.isclose(row.beta_qty_cents, beta[1], rel_tol=1e-9)
    assert math.isclose(row.beta_disc_cents, beta[2], rel_tol=1e-6, abs_tol=1e-6)


def test_mase_matches_direct(spark):
    """q215 == a direct pandas recomputation: densified hourly series,
    lag-24 and lag-1 absolute error sums, integer ppm ratio."""
    import pandas as pd

    ev = load_table(spark, SMOKE_SF_DIR, "events").select("event_type", "ts")
    pdf = ev.toPandas()
    pdf["hour"] = pdf["ts"].dt.floor("h")
    got = {
        r.event_type: r
        for r in eq.q215_seasonal_naive_mase(spark, SMOKE_SF_DIR).collect()
    }
    for t, g in pdf.groupby("event_type"):
        counts = g.groupby("hour").size()
        idx = pd.date_range(counts.index.min(), counts.index.max(), freq="h")
        dense = counts.reindex(idx, fill_value=0).to_numpy()
        if len(dense) <= eq.MASE_SEASON_H:
            assert t not in got
            continue
        n = dense[eq.MASE_SEASON_H :]
        sae_s = int(np.abs(n - dense[: -eq.MASE_SEASON_H]).sum())
        sae_1 = int(
            np.abs(n - dense[eq.MASE_SEASON_H - 1 : -1]).sum()
        )
        row = got[t]
        assert row.n_hours_scored == len(n)
        assert (row.sae_seasonal, row.sae_naive1) == (sae_s, sae_1)
        assert row.mase_ppm == (tdiv(sae_s * 10**6, sae_1) if sae_1 else None)


def test_zipf_fit_matches_numpy(spark):
    """q216's sufficient statistics == exact Python sums over the same
    micro-nat points; slope == numpy polyfit on those points to float
    precision, and r_squared in [0, 1]."""
    docs = load_table(spark, SMOKE_SF_DIR, "documents").collect()
    cnt = Counter()
    for r in docs:
        if r.text is not None:
            cnt.update(r.text.lower().split(" "))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
        : kq.ZIPF_TOP_R
    ]
    pts = [
        (
            int(math.floor(math.log(i + 1) * 1e6 + 0.5)),
            int(math.floor(math.log(c) * 1e6 + 0.5)),
        )
        for i, (_, c) in enumerate(ranked)
    ]
    xs = np.array([p[0] for p in pts], dtype=np.int64)
    ys = np.array([p[1] for p in pts], dtype=np.int64)
    row = kq.q216_zipf_exponent_fit(spark, SMOKE_SF_DIR).collect()[0]
    assert row.n == len(pts)
    assert row.sx == xs.sum() and row.sy == ys.sum()
    assert row.sxx == (xs * xs).sum() and row.sxy == (xs * ys).sum()
    assert row.syy == (ys * ys).sum()
    slope = np.polyfit(xs.astype(float), ys.astype(float), 1)[0]
    assert math.isclose(row.zipf_slope, slope, rel_tol=1e-6)
    assert 0.0 <= row.r_squared <= 1.0


# --- wave 8 (q217-q221) ----------------------------------------------------


def test_effective_rank_matches_numpy(spark):
    """q217's trace/frobenius == numpy on the same integer covariance
    cells (trunc-div normalized), and PR lands in [1, d]."""
    emb = load_table(spark, SMOKE_SF_DIR, "embeddings")
    X = np.vstack(
        [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
    )
    Q = np.floor(X * sq.GRAM_SCALE + 0.5).astype(np.int64)
    n, d = Q.shape
    G = Q.T @ Q
    S = Q.sum(axis=0)
    C = n * G - np.outer(S, S)
    tsign = np.sign(C)
    Cn = (tsign * (np.abs(C) // (n * n))).astype(np.int64)  # trunc div
    trace = int(np.trace(Cn))
    frob = int((Cn * Cn).sum())
    row = sq.q217_embedding_effective_rank(spark, SMOKE_SF_DIR).collect()[0]
    assert (row.d, row.n_vecs) == (d, n)
    assert row.trace_centi2 == trace
    assert row.frob2 == frob
    assert math.isclose(row.participation_ratio, trace * trace / frob, rel_tol=1e-12)
    assert 1.0 <= row.participation_ratio <= d


def test_langid_calibration_matches_direct(spark):
    """q218 == a python recount of the same stopword scoring, binning,
    and integer ECE terms."""
    from retail_sales_etl_pipeline_spark.operators.text import LANG_STOPWORDS

    docs = load_table(spark, SMOKE_SF_DIR, "documents").collect()
    langs = list(LANG_STOPWORDS)
    bins = defaultdict(lambda: [0, 0, 0])  # n, correct, conf_sum
    for r in docs:
        toks = set((r.text or "").lower().split(" "))
        scores = {lg: len(toks & set(LANG_STOPWORDS[lg])) for lg in langs}
        pred = next(
            lg
            for lg in langs
            if all(scores[lg] >= scores[o] for o in langs if o != lg)
        )
        total = sum(scores.values())
        conf = tdiv(scores[pred] * 10**6, total) if total else 0
        b = min(conf // 200000, 4)
        bins[b][0] += 1
        bins[b][1] += int(pred == r.lang)
        bins[b][2] += conf
    n_total = len(docs)
    got = {
        r.bin: r
        for r in tq.q218_langid_calibration(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(bins)
    for b, (n, c, cs) in bins.items():
        row = got[b]
        acc = tdiv(c * 10**6, n)
        mc = tdiv(cs, n)
        assert (row.n_docs, row.n_correct) == (n, c)
        assert (row.acc_ppm, row.mean_conf_ppm) == (acc, mc)
        assert row.ece_term_ppm == tdiv(n * abs(acc - mc), n_total)


def test_kmv_algebra_matches_direct(spark):
    """q219 == a python KMV over the same polynomial+affine hashes,
    including the small-set rule and the (K-1)*M/kth estimator."""
    from retail_sales_etl_pipeline_spark.functions.scalar import (
        POLY_BASE,
        POLY_MOD,
    )

    K = dq.KMV_ALG_K
    docs = load_table(spark, SMOKE_SF_DIR, "documents").collect()
    by_src = defaultdict(set)
    for r in docs:
        h = 0
        for ch in r.text or "":
            h = (h * POLY_BASE + ord(ch)) % POLY_MOD
        sk = (dq.OVERLAP_A * h + dq.OVERLAP_B) % POLY_MOD
        by_src[r.source].add(sk)

    def est(vals):
        s = sorted(vals)
        if len(s) < K:
            return len(s)
        return tdiv((K - 1) * POLY_MOD, s[K - 1])

    got = {
        (r.src_a, r.src_b): r
        for r in dq.q219_kmv_cardinality_algebra(spark, SMOKE_SF_DIR).collect()
    }
    srcs = sorted(by_src)
    want_pairs = {(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1 :]}
    assert set(got) == want_pairs
    for (a, b), row in got.items():
        A, B = by_src[a], by_src[b]
        assert (row.est_a, row.est_b) == (est(A), est(B))
        assert row.est_union == est(A | B)
        assert row.est_intersection == est(A) + est(B) - est(A | B)
        assert (row.n_exact_a, row.n_exact_b) == (len(A), len(B))
        assert row.n_exact_union == len(A | B)
        assert row.n_exact_intersection == len(A) + len(B) - len(A | B)


def test_redelivery_dedup_matches_pandas(spark):
    """q220 == a pandas recount: survivors are rows whose same-key
    predecessor is absent or more than the horizon away."""
    ev = load_table(spark, SMOKE_SF_DIR, "events").toPandas()
    ev = ev.sort_values(["user_id", "event_type", "props", "ts", "event_id"])
    prev = ev.groupby(["user_id", "event_type", "props"])["ts"].shift(1)
    gap = (ev["ts"] - prev).dt.total_seconds() * 1_000_000
    keep = gap.isna() | (gap > eq.REDELIVERY_HORIZON_S * 1_000_000)
    want = set(ev.loc[keep, "event_id"])
    rows = eq.q220_event_redelivery_dedup(spark, SMOKE_SF_DIR).collect()
    assert {r.event_id for r in rows} == want
    # and every dropped event really has a same-key predecessor inside
    # the horizon
    dropped = set(ev["event_id"]) - want
    assert all(
        g <= eq.REDELIVERY_HORIZON_S * 1_000_000
        for g, k in zip(gap, keep)
        if not k and not math.isnan(g)
    )
    assert len(dropped) == int((~keep).sum())


def test_hll_merge_identity_holds(spark):
    """q221: zero register mismatches, merge_identical everywhere, and
    register counts equal a direct python register build."""
    ev = [
        (r.event_type, r.user_id)
        for r in load_table(spark, SMOKE_SF_DIR, "events").collect()
        if r.user_id is not None
    ]
    regs = defaultdict(dict)
    for t, u in ev:
        h = (eq.HLL_SALT_A * u + eq.HLL_SALT_B) % eq._HLL_MOD
        b, w = h % eq.HLL_M, h // eq.HLL_M
        rho = 21 if w == 0 else 20 - w.bit_length() + 1
        regs[t][b] = max(regs[t].get(b, 0), rho)
    rows = eq.q221_hll_merge_identity(spark, SMOKE_SF_DIR).collect()
    assert {r.event_type for r in rows} == set(regs)
    for r in rows:
        assert r.n_register_mismatch == 0
        assert r.merge_identical == 1
        assert r.n_registers == len(regs[r.event_type])
        denom = (eq.HLL_M - len(regs[r.event_type])) * (1 << 21) + sum(
            1 << (21 - m) for m in regs[r.event_type].values()
        )
        assert r.est_hll == tdiv(
            tdiv(eq.HLL_ALPHA_M2_MICRO * (1 << 21), denom), 10**6
        )


# --- wave 9 (q222-q225) ----------------------------------------------------


def test_segment_boilerplate_matches_direct(spark):
    """q222 == a python recount of the same segmentation and DF rule."""
    docs = {
        r.doc_id: (r.text or "").lower().split(" ")
        for r in load_table(spark, SMOKE_SF_DIR, "documents").collect()
        if r.text is not None
    }
    W = tq.SEG_WIDTH
    segs = {
        d: [
            (" ".join(t[i : i + W]), len(t[i : i + W]))
            for i in range(0, len(t), W)
        ]
        for d, t in docs.items()
    }
    df = Counter()
    for d, ss in segs.items():
        for s in {s for s, _ in ss}:
            df[s] += 1
    got = {
        r.doc_id: r
        for r in tq.q222_segment_boilerplate(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(segs)
    for d, ss in segs.items():
        n_seg = len(ss)
        n_boil = sum(1 for s, _ in ss if df[s] >= tq.SEG_BOILER_DF)
        n_tok = sum(L for _, L in ss)
        n_boil_tok = sum(L for s, L in ss if df[s] >= tq.SEG_BOILER_DF)
        row = got[d]
        assert (row.n_segments, row.n_boilerplate_segments) == (n_seg, n_boil)
        assert (row.n_tokens, row.n_boilerplate_tokens) == (n_tok, n_boil_tok)
        assert row.boilerplate_ppm == tdiv(n_boil_tok * 10**6, n_tok)


def test_mixture_kl_matches_direct(spark):
    """q223's terms == python recount; the summed KL is non-negative
    (up to ppm truncation) and zero iff uniform."""
    from retail_sales_etl_pipeline_spark.plans import mixing_queries as mq

    docs = load_table(spark, SMOKE_SF_DIR, "documents").collect()
    n_l = Counter()
    for r in docs:
        if r.text is not None:
            n_l[r.lang] += len(r.text.lower().split(" "))
    N = sum(n_l.values())
    L = len(n_l)
    lm = lambda x: int(math.floor(math.log(x) * 1e6 + 0.5))  # noqa: E731
    got = {
        r.lang: r
        for r in mq.q223_mixture_kl_drift(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(n_l)
    total = 0
    for lg, n in n_l.items():
        row = got[lg]
        share = tdiv(n * 10**6, N)
        term = tdiv(share * (lm(n) + lm(L) - lm(N)), 10**6)
        assert (row.n_l, row.share_ppm) == (n, share)
        assert row.target_share_ppm == tdiv(10**6, L)
        assert row.kl_term_micronat == term
        total += term
    # exact KL >= 0; ppm truncation can only lose ~L micro-nats
    assert total >= -len(n_l)


def test_survivor_policy_matches_direct(spark):
    """q224 == a python recount of both survivor rules per dup group."""
    import hashlib

    docs = [
        r
        for r in load_table(spark, SMOKE_SF_DIR, "documents").collect()
        if r.text is not None
    ]
    groups = defaultdict(list)
    for r in docs:
        k = hashlib.sha256(r.text.lower()[:100].encode()).hexdigest()
        groups[k].append((r.doc_id, r.n_chars))
    want = {}
    for k, members in groups.items():
        if len(members) < 2:
            continue
        min_id = min(d for d, _ in members)
        best_len = max(c for _, c in members)
        q_surv = min(d for d, c in members if c == best_len)
        want[k] = (len(members), min_id, q_surv, best_len, int(q_surv != min_id))
    got = {
        r.content_hash: (
            r.n_copies,
            r.min_id_survivor,
            r.quality_survivor,
            r.survivor_n_chars,
            r.policy_differs,
        )
        for r in dq.q224_survivor_policy_dedup(spark, SMOKE_SF_DIR).collect()
    }
    assert got == want


def test_vocab_coverage_matches_direct(spark):
    """q225 == python cumulative-share recount; the curve is monotone."""
    docs = load_table(spark, SMOKE_SF_DIR, "documents").collect()
    cnt = Counter()
    for r in docs:
        if r.text is not None:
            cnt.update(r.text.lower().split(" "))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    N = sum(cnt.values())
    got = {
        r.k: r
        for r in kq.q225_vocab_coverage_curve(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(kq.COVERAGE_KS)
    prev = -1
    for k in sorted(kq.COVERAGE_KS):
        covered = sum(c for _, c in ranked[:k])
        row = got[k]
        assert (row.n_vocab, row.n_tokens) == (len(cnt), N)
        assert row.tokens_covered == covered
        assert row.coverage_ppm == tdiv(covered * 10**6, N)
        assert row.tokens_covered >= prev
        prev = row.tokens_covered
