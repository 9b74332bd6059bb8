"""Value-checking tests for the round-6 wave-10 queries (q226-q231):
each query's CLAIMED property is verified independently of the DuckDB
oracle (the oracle proves cross-engine agreement; these prove the math).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from retail_sales_etl_pipeline_spark.plans import analytic_queries as aq
from retail_sales_etl_pipeline_spark.plans import dedup_queries as dq
from retail_sales_etl_pipeline_spark.plans import event_queries as eq
from retail_sales_etl_pipeline_spark.plans import text_queries as tq
from retail_sales_etl_pipeline_spark.sources import load_table

from .conftest import SMOKE_SF_DIR


def tdiv(a: int, b: int) -> int:
    """SQL div: integer division truncating toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_roc_auc_matches_brute_force(spark):
    """q226's rank-sum AUC == the O(P*N) brute-force pair count over the
    same centi-quantized scores, ties counted half."""
    rows = load_table(spark, SMOKE_SF_DIR, "events").select(
        "event_type", "value"
    ).collect()
    pos = [math.floor(r.value * 100.0) for r in rows if r.event_type == "purchase"]
    neg = [math.floor(r.value * 100.0) for r in rows if r.event_type != "purchase"]
    neg_counter = Counter(neg)
    num2 = 0
    for s in pos:
        for t, c in neg_counter.items():
            if s > t:
                num2 += 2 * c
            elif s == t:
                num2 += c
    got = eq.q226_roc_auc(spark, SMOKE_SF_DIR).collect()[0]
    assert got.n_pos == len(pos)
    assert got.n_neg == len(neg)
    assert int(got.num2) == num2
    assert got.auc == num2 / (2.0 * len(pos) * len(neg))
    assert abs(got.gini - (2.0 * got.auc - 1.0)) < 1e-15
    assert 0.0 <= got.auc <= 1.0


def test_target_encoding_loo_matches_direct(spark):
    """q227 == per-row recomputation of the smoothed LOO formula, and the
    encoding never uses the row's own label (flipping y changes enc)."""
    orders = load_table(spark, SMOKE_SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    ).collect()
    n_all = len(orders)
    pos_all = sum(1 for r in orders if r.o_orderstatus == "F")
    g_ppm = tdiv(1000000 * pos_all, n_all)
    cat_n = Counter(r.o_orderpriority for r in orders)
    cat_pos = Counter(
        r.o_orderpriority for r in orders if r.o_orderstatus == "F"
    )
    m = aq.TE_SMOOTHING_M
    got = {
        r.o_orderkey: r
        for r in aq.q227_target_encoding_loo(spark, SMOKE_SF_DIR).collect()
    }
    assert len(got) == n_all
    for r in orders:
        y = 1 if r.o_orderstatus == "F" else 0
        want = tdiv(
            1000000 * (cat_pos[r.o_orderpriority] - y) + m * g_ppm,
            cat_n[r.o_orderpriority] - 1 + m,
        )
        row = got[r.o_orderkey]
        assert row.enc_ppm == want
        assert row.y == y
    # leave-one-out: within a category, positives see a strictly lower
    # encoding than negatives (their own +1 is excluded)
    by_cat = defaultdict(set)
    for row in got.values():
        by_cat[row.category].add((row.y, row.enc_ppm))
    for cat, pairs in by_cat.items():
        enc_pos = {e for y, e in pairs if y == 1}
        enc_neg = {e for y, e in pairs if y == 0}
        if enc_pos and enc_neg:
            assert max(enc_pos) < min(enc_neg)


def test_t_closeness_matches_direct(spark):
    """q228 == direct ppm-quantized EMD over the 8 ordered buckets."""
    B = aq.TCLOSE_BUCKETS
    orders = load_table(spark, SMOKE_SF_DIR, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    ).collect()
    lab = [
        (
            r.o_orderpriority,
            r.o_orderdate.year,
            min(B - 1, math.floor(r.o_totalprice / 62500.0)),
        )
        for r in orders
    ]
    n_all = len(lab)
    all_cnt = Counter(b for _, _, b in lab)
    grp_rows = defaultdict(list)
    for p, y, b in lab:
        grp_rows[(p, y)].append(b)
    got = {
        (r.qi_priority, r.qi_year): r
        for r in aq.q228_t_closeness(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(grp_rows)
    for key, buckets in grp_rows.items():
        n_g = len(buckets)
        g_cnt = Counter(buckets)
        cum_g = cum_all = 0
        total = 0
        for k in range(B - 1):  # bucket B-1 excluded: both cums are ~1
            cum_g += tdiv(1000000 * g_cnt.get(k, 0), n_g)
            cum_all += tdiv(1000000 * all_cnt.get(k, 0), n_all)
            total += abs(cum_g - cum_all)
        want = tdiv(total, B - 1)
        assert got[key].n_g == n_g
        assert got[key].emd_ppm == want
        assert got[key].t_violation == (1 if want > aq.TCLOSE_T_PPM else 0)


def test_mi_feature_screen_matches_direct(spark):
    """q229 == direct micro-nat MI recomputation, and the micro-nat value
    is within 2 nats-e-6 * N of the float MI (rounding bound)."""

    def L(x: int) -> int:
        return math.floor(math.log(x) * 1000000.0 + 0.5)

    docs = load_table(spark, SMOKE_SF_DIR, "documents").select(
        "source", "n_chars", "lang"
    ).collect()
    feats = {
        "source": [(r.source, r.lang) for r in docs],
        "len_band": [(str(r.n_chars // 120), r.lang) for r in docs],
    }
    got = {
        r.feature: r
        for r in tq.q229_mi_feature_screen(spark, SMOKE_SF_DIR).collect()
    }
    for feature, obs in feats.items():
        n = len(obs)
        cells = Counter(obs)
        cx = Counter(x for x, _ in obs)
        cy = Counter(y for _, y in obs)
        s = sum(
            c * (L(n) + L(c) - L(cx[x]) - L(cy[y]))
            for (x, y), c in cells.items()
        )
        want = tdiv(max(0, s), n)
        row = got[feature]
        assert row.n == n
        assert row.n_cells == len(cells)
        assert row.mi_micronat == want
        # sanity against the float MI (nats), rounding-error bound
        float_mi = sum(
            (c / n) * math.log(c * n / (cx[x] * cy[y]))
            for (x, y), c in cells.items()
        )
        assert abs(row.mi_micronat - float_mi * 1e6) <= len(cells) * 4 + 2
        assert row.mi_micronat >= 0
    # the length band is lang-independent by construction, the source
    # mix is too — both MIs should be tiny (< 0.05 nats); the screen's
    # job is exactly this separation from a genuinely informative pair
    assert got["len_band"].mi_micronat < 50000


def test_label_propagation_matches_direct(spark):
    """q230 == direct plurality vote over q21's verified pairs with the
    (votes DESC, lang ASC) tie-break."""
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dq.q21_ngram_jaccard_pairs(spark, SMOKE_SF_DIR).collect()
    ]
    lang = {
        r.doc_id: r.lang
        for r in load_table(spark, SMOKE_SF_DIR, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    nbrs = defaultdict(list)
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
    got = {
        r.doc_id: r
        for r in dq.q230_label_propagation(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(nbrs)
    for doc, ns in nbrs.items():
        votes = Counter(lang[n] for n in ns)
        new_lang, n_votes = min(
            votes.items(), key=lambda kv: (-kv[1], kv[0])
        )
        row = got[doc]
        assert row.new_lang == new_lang
        assert row.votes == n_votes
        assert row.own_lang == lang[doc]
        assert row.changed == (1 if new_lang != lang[doc] else 0)


def test_conformal_thresholds_coverage(spark):
    """q231: threshold == the ceil((n+1)*0.9)-th smallest score per lang,
    and the split-conformal coverage inequality holds on the calibration
    set itself (#{score <= threshold} >= k)."""
    docs = load_table(spark, SMOKE_SF_DIR, "documents").select(
        "lang", "n_chars", "doc_id"
    ).collect()
    by_lang = defaultdict(list)
    for r in docs:
        by_lang[r.lang].append((r.n_chars, r.doc_id))
    got = {
        r.lang: r
        for r in tq.q231_conformal_thresholds(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(by_lang)
    for lg, scores in by_lang.items():
        scores.sort()
        n = len(scores)
        k = min(n, ((n + 1) * 9 + 9) // 10)
        row = got[lg]
        assert row.n == n
        assert row.k == k
        assert row.threshold == scores[k - 1][0]
        assert row.coverage_ppm == tdiv(1000000 * k, n + 1)
        covered = sum(1 for s, _ in scores if s <= row.threshold)
        assert covered >= k
        assert row.coverage_ppm >= 900000 - 1000000 // (n + 1)
