"""Value-checking tests for the round-6 wave-11 queries (q232-q235):
each query's CLAIMED property is verified independently of the DuckDB
oracle (the oracle proves cross-engine agreement; these prove the math).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from retail_sales_etl_pipeline_spark.functions.scalar import POLY_BASE, POLY_MOD
from retail_sales_etl_pipeline_spark.plans import analytic_queries as aq
from retail_sales_etl_pipeline_spark.plans import dedup_queries as dq
from retail_sales_etl_pipeline_spark.plans import event_queries as eq
from retail_sales_etl_pipeline_spark.plans import mixing_queries as mq
from retail_sales_etl_pipeline_spark.plans import similarity_queries as sq
from retail_sales_etl_pipeline_spark.plans import text_queries as tq
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


def test_poisson_bootstrap_matches_direct(spark):
    """q232 == direct recomputation: deterministic Poisson weights from
    the salted hash, replicate means in micro units, centered variance."""
    docs = load_table(spark, SMOKE_SF_DIR, "documents").select(
        "text", "n_chars"
    ).collect()
    xs = [(poly_hash(r.text), r.n_chars) for r in docs]
    n = len(xs)
    full_mean = tdiv(1000000 * sum(x for _, x in xs), n)

    def w(key: int, r: int) -> int:
        u = (
            (aq.BOOT_SALT_A + r * aq.BOOT_SALT_C) * key
            + aq.BOOT_SALT_B + r * aq.BOOT_SALT_R
        ) % POLY_MOD % 1000000
        return sum(1 for t in aq.BOOT_CDF_PPM if u >= t)

    means = []
    for r in range(1, aq.BOOT_R + 1):
        num = sum(w(k, r) * x for k, x in xs)
        den = sum(w(k, r) for k, _ in xs)
        if den:
            means.append(tdiv(1000000 * num, den))
    var = tdiv(
        sum((m - full_mean) ** 2 for m in means), len(means) - 1
    )
    got = aq.q232_poisson_bootstrap_se(spark, SMOKE_SF_DIR).collect()[0]
    assert got.r_eff == len(means) == aq.BOOT_R
    assert got.full_mean_micro == full_mean
    assert got.var_micro2 == var
    assert got.se_micro == math.sqrt(var)
    # bootstrap SE of a mean of n iid lengths ~ sd/sqrt(n): sanity band
    sd = np.std([x for _, x in xs])
    se_theory = 1e6 * sd / math.sqrt(n)
    assert 0.3 * se_theory < got.se_micro < 3.0 * se_theory


def test_simplified_silhouette_matches_numpy(spark):
    """q233 == numpy recomputation of the integer micro-unit pipeline."""
    rows = load_table(spark, SMOKE_SF_DIR, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    pts = {
        r.vec_id: (
            int(r.label),
            [math.floor(float(v) * 1000000) for v in r.embedding],
        )
        for r in rows
    }
    sums: dict[int, list[int]] = {}
    counts: dict[int, int] = Counter()
    for lbl, x in pts.values():
        s = sums.setdefault(lbl, [0] * len(x))
        for i, v in enumerate(x):
            s[i] += v
        counts[lbl] += 1
    cents = {
        lbl: [tdiv(v, counts[lbl]) for v in s] for lbl, s in sums.items()
    }
    per_label = defaultdict(list)
    for lbl, x in pts.values():
        d2 = {
            c: sum((xi - ci) ** 2 for xi, ci in zip(x, cent))
            for c, cent in cents.items()
        }
        a = d2[lbl]
        b = min(v for c, v in d2.items() if c != lbl)
        denom = max(a, b)
        # mirror the engine's IEEE op order: double(b-a) * 1e6 / denom
        s_ppm = math.floor(float(b - a) * 1000000.0 / float(denom)) if denom else 0
        per_label[lbl].append(s_ppm)
    got = {
        r.label: r
        for r in sq.q233_simplified_silhouette(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(per_label)
    for lbl, vals in per_label.items():
        row = got[lbl]
        assert row.n_vecs == len(vals)
        assert row.mean_s_ppm == tdiv(sum(vals), len(vals))
        assert row.n_negative == sum(1 for v in vals if v < 0)
    # discriminative check: the TRUE labeling must score strictly better
    # than a deliberately wrong one (labels rotated by 1) recomputed with
    # the identical integer pipeline — euclidean silhouette can sit near 0
    # on noisy overlapping clusters, but a wrong labeling must sit lower
    k = len(cents)
    wrong = []
    for lbl, x in pts.values():
        wl = (lbl + 1) % k
        d2 = {
            c: sum((xi - ci) ** 2 for xi, ci in zip(x, cent))
            for c, cent in cents.items()
        }
        a = d2[wl]
        b = min(v for c, v in d2.items() if c != wl)
        denom = max(a, b)
        wrong.append(
            math.floor(float(b - a) * 1000000.0 / float(denom)) if denom else 0
        )
    true_mean = sum(v for vals in per_label.values() for v in vals) / sum(
        len(v) for v in per_label.values()
    )
    assert true_mean > sum(wrong) / len(wrong) + 20000


def test_modularity_matches_direct(spark):
    """q234 == direct e_c/d_c counting over q21's pairs; contributions
    sum to the float modularity."""
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
    m = len(pairs)
    e_c: Counter = Counter()
    d_c: Counter = Counter()
    for a, b in pairs:
        la, lb = lang[a], lang[b]
        if la == lb:
            e_c[la] += 1
        d_c[la] += 1
        d_c[lb] += 1
    got = {
        r.lang: r
        for r in dq.q234_modularity_score(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(d_c)
    q_total = 0.0
    for lg, row in got.items():
        assert row.m == m
        assert row.e_c == e_c.get(lg, 0)
        assert row.d_c == d_c[lg]
        q_num = 4 * m * e_c.get(lg, 0) - d_c[lg] ** 2
        assert row.q_num == q_num
        assert abs(row.q_contrib - q_num / (4.0 * m * m)) < 1e-15
        q_total += row.q_contrib
    # Q is bounded; at smoke scale the 31-word vocab produces chance
    # CROSS-language trigram twins, so Q sits near 0 — which is exactly
    # the cross-language-dup signal the metric exists to surface
    assert -1.0 <= q_total <= 1.0
    assert abs(q_total - (sum(e_c.values()) / m
                          - sum((d / (2 * m)) ** 2 for d in d_c.values())
                          )) < 1e-12


def test_curriculum_buckets_matches_direct(spark):
    """q235 == direct histogram-CDF staging of q88's difficulty, with
    monotone stages and roughly-quartile masses."""
    diff = {
        r.doc_id: r.mean_surprisal_micronat
        for r in tq.q88_unigram_surprisal(spark, SMOKE_SF_DIR).collect()
    }
    text = {
        r.doc_id: r.text
        for r in load_table(spark, SMOKE_SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    n = len(diff)
    bkt = {d: v // mq.CURR_BUCKET_MICRONAT for d, v in diff.items()}
    hist = Counter(bkt.values())
    stage_of_bkt = {}
    cum = 0
    for b in sorted(hist):
        stage_of_bkt[b] = min(
            mq.CURR_STAGES - 1, tdiv(mq.CURR_STAGES * cum, n)
        )
        cum += hist[b]
    got = {
        r.doc_id: r
        for r in mq.q235_curriculum_buckets(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(diff)
    for d, row in got.items():
        assert row.difficulty_micronat == diff[d]
        assert row.stage == stage_of_bkt[bkt[d]]
        key = (
            mq.CURR_SALT_A * poly_hash(text[d]) + mq.CURR_SALT_B
        ) % 1000000
        assert row.shuffle_key == key
    # stages are monotone in difficulty and each holds a nontrivial mass
    by_stage = defaultdict(list)
    for d, row in got.items():
        by_stage[row.stage].append(diff[d])
    stages = sorted(by_stage)
    # bucket-granular staging: a bucket whose mass spans a whole quartile
    # absorbs it, so interior stage indices may be EMPTY at tiny corpus
    # sizes (mass concentrates in few centi-nat buckets); the first and
    # last stages always exist and ordering is monotone across present
    # stages
    assert set(stages) <= set(range(mq.CURR_STAGES))
    assert stages[0] == 0 and stages[-1] == mq.CURR_STAGES - 1
    for s1, s2 in zip(stages, stages[1:]):
        assert max(by_stage[s1]) <= min(by_stage[s2]) + mq.CURR_BUCKET_MICRONAT
    assert sum(len(v) for v in by_stage.values()) == n


def test_ks_drift_matches_direct(spark):
    """q236 == direct bucket-CDF KS recomputation with the same
    ppm quantization and the asymptotic critical value."""
    from datetime import datetime

    split = datetime.fromisoformat(eq.PSI_SPLIT_TS)
    rows = load_table(spark, SMOKE_SF_DIR, "events").select(
        "ts", "value"
    ).collect()
    early = Counter()
    late = Counter()
    for r in rows:
        b = math.floor(r.value * 100.0)
        if r.ts < split:
            early[b] += 1
        else:
            late[b] += 1
    n_e = sum(early.values())
    n_l = sum(late.values())
    cum_e = cum_l = 0
    d = 0
    for b in sorted(set(early) | set(late)):
        cum_e += tdiv(1000000 * early.get(b, 0), n_e)
        cum_l += tdiv(1000000 * late.get(b, 0), n_l)
        d = max(d, abs(cum_e - cum_l))
    got = eq.q236_ks_drift_test(spark, SMOKE_SF_DIR).collect()[0]
    assert got.n_early == n_e
    assert got.n_late == n_l
    assert got.d_ppm == d
    crit = (eq.KS_C001_MICRO / 1e6) * math.sqrt((n_e + n_l) / (n_e * n_l))
    assert abs(got.crit_001 - crit) < 1e-12
    assert got.reject_001 == (1 if d / 1e6 > got.crit_001 else 0)
    # same generator for both halves: KS must NOT reject
    assert got.reject_001 == 0


def test_token_budget_selection_matches_direct(spark):
    """q237: per source, the kept set is exactly the longest-first
    greedy prefix whose running token total fits the budget."""
    from retail_sales_etl_pipeline_spark.plans import curation_queries as cq

    docs = load_table(spark, SMOKE_SF_DIR, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    by_src = defaultdict(list)
    for r in docs:
        by_src[r.source].append((len(r.text.split(" ")), r.doc_id))
    want = {}
    for src, items in by_src.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        cum = 0
        for n_tok, d in items:
            cum += n_tok
            if cum > cq.TOKEN_BUDGET_PER_SOURCE:
                break
            want[(src, d)] = (n_tok, cum)
    got = {
        (r.source, r.doc_id): (r.n_tokens, r.cum_tokens)
        for r in cq.q237_token_budget_selection(spark, SMOKE_SF_DIR).collect()
    }
    assert got == want
    # every source's kept token total fits the budget
    totals = defaultdict(int)
    for (src, _), (n_tok, _) in got.items():
        totals[src] += n_tok
    for src, tot in totals.items():
        assert tot <= cq.TOKEN_BUDGET_PER_SOURCE
