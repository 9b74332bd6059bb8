"""Round-5 wave 4: cohort revenue triangle (q184), LOCF balance grid
(q185), G-test independence (q186), Benford audit (q187).

Hash-parity is the correctness gate's job; these pin the independent
semantics: python recounts, triangle/LOCF structural invariants, the
float recompute of the fixed-point G statistic, and the exactness of
the hardcoded Benford constants.
"""

from __future__ import annotations

import math

from retail_sales_etl_pipeline_spark.plans.analytic_queries import (
    BENFORD_PPM,
    q184_cohort_revenue_triangle,
    q187_benford_audit,
)
from retail_sales_etl_pipeline_spark.plans.event_queries import (
    q185_balance_carry_forward,
    q186_gtest_independence,
)

from .conftest import SMOKE_SF_DIR


# ---------------------------------------------------------------- q184


def test_cohort_triangle_matches_python_recount(spark, duck):
    got = {
        (r["cohort_month"], r["age_months"]): r
        for r in q184_cohort_revenue_triangle(spark, SMOKE_SF_DIR).collect()
    }
    rows = duck.execute(
        "SELECT o_custkey, o_orderdate, o_totalprice FROM orders"
    ).fetchall()
    first = {}
    for ck, od, _ in rows:
        if ck not in first or od < first[ck]:
            first[ck] = od
    from collections import defaultdict

    cells = defaultdict(lambda: [set(), 0])
    for ck, od, _ in rows:
        f = first[ck]
        age = (od.year * 12 + od.month) - (f.year * 12 + f.month)
        key = (f.strftime("%Y-%m"), age)
        cells[key][0].add(ck)
        cells[key][1] += 1
    assert set(got) == set(cells)
    for key, (custs, n_orders) in cells.items():
        assert got[key]["n_active"] == len(custs)
        assert got[key]["n_orders"] == n_orders
    # age-0 cell of each cohort contains the whole cohort
    cohort_size = defaultdict(set)
    for ck, f in first.items():
        cohort_size[f.strftime("%Y-%m")].add(ck)
    for cm, members in cohort_size.items():
        assert got[(cm, 0)]["n_active"] == len(members)
    # activity can only shrink-or-equal relative to the cohort size
    for (cm, age), r in got.items():
        assert r["n_active"] <= len(cohort_size[cm])
        assert age >= 0


# ---------------------------------------------------------------- q185


def test_locf_grid_matches_python_carry(spark, duck):
    got = {
        (r["user_id"], r["day"]): r
        for r in q185_balance_carry_forward(spark, SMOKE_SF_DIR).collect()
    }
    rows = duck.execute(
        "SELECT user_id, ts::DATE, CAST(CAST(value AS DECIMAL(18,2)) * 100"
        " AS BIGINT) FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    closing: dict[tuple, int] = {}
    for uid, day, cents in rows:  # later rows overwrite = closing value
        closing[(uid, day)] = cents
    max_day = max(d for _, d in closing)
    from datetime import timedelta

    want = {}
    for uid in {u for u, _ in closing}:
        days = sorted(d for u, d in closing if u == uid)
        cur, d = None, days[0]
        while d <= max_day:
            key = (uid, d)
            observed = key in closing
            if observed:
                cur = closing[key]
            want[(uid, d.strftime("%Y-%m-%d"))] = (cur, observed)
            d += timedelta(days=1)
    assert set(got) == set(want)
    for key, (cents, observed) in want.items():
        assert got[key]["closing_cents"] == cents, key
        assert got[key]["is_observed"] == observed
    # grid is dense: every user spans first-active .. corpus max day
    from collections import Counter

    per_user = Counter(uid for uid, _ in got)
    for uid, n in per_user.items():
        first = min(d for (u, d) in want if u == uid)
        import datetime as dt

        span = (max_day - dt.date.fromisoformat(first)).days + 1
        assert n == span


# ---------------------------------------------------------------- q186


def test_gtest_matches_float_recompute(spark, duck):
    got = {
        (r["dow"], r["event_type"]): r
        for r in q186_gtest_independence(spark, SMOKE_SF_DIR).collect()
    }
    rows = duck.execute(
        "SELECT CAST(date_part('dow', ts) AS INTEGER), event_type, COUNT(*)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    from collections import Counter

    obs = {(d, e): n for d, e, n in rows}
    row_n: Counter = Counter()
    col_n: Counter = Counter()
    for (d, e), n in obs.items():
        row_n[d] += n
        col_n[e] += n
    tot = sum(obs.values())
    assert set(got) == set(obs)
    g_total = 0
    for (d, e), n in obs.items():
        want = 2 * n * math.log(n * tot / (row_n[d] * col_n[e])) * 1e6
        # fixed-point: 2n * (sum of four rounded micro-nats) — within
        # 2n*2 micro-nats of the float form
        assert abs(got[(d, e)]["g_contrib_micro"] - want) <= 4 * n + 4
        g_total += got[(d, e)]["g_contrib_micro"]
    # total G statistic is non-negative (Gibbs' inequality)
    assert g_total >= 0


# ---------------------------------------------------------------- q187


def test_benford_constants_and_counts(spark, duck):
    assert sum(BENFORD_PPM.values()) == 1_000_000
    for d, p in BENFORD_PPM.items():
        assert abs(p - math.log10(1 + 1 / d) * 1e6) < 1
    got = {r["digit"]: r for r in q187_benford_audit(spark, SMOKE_SF_DIR).collect()}
    rows = duck.execute(
        "SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2))"
        " AS VARCHAR), 1, 1) AS INTEGER), COUNT(*)"
        " FROM orders WHERE o_totalprice >= 1 GROUP BY 1"
    ).fetchall()
    want = dict(rows)
    tot = sum(want.values())
    assert {k: r["n"] for k, r in got.items()} == want
    for d, r in got.items():
        assert r["observed_ppm"] == r["n"] * 1_000_000 // tot
        assert r["deviation_ppm"] == r["observed_ppm"] - BENFORD_PPM[d]
        assert 1 <= d <= 9


# ---------------------------------------------------------------- q188


def test_chain_depth_matches_python_dag_walk(spark):
    from collections import defaultdict

    from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
        CHAIN_MAX_HOPS,
        q21_ngram_jaccard_pairs,
        q188_neardup_chain_depth,
    )

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in q21_ngram_jaccard_pairs(spark, SMOKE_SF_DIR).collect()
    ]
    assert all(a < b for a, b in pairs)  # the acyclicity the walk rests on
    out = defaultdict(set)
    has_parent = {b for _, b in pairs}
    for a, b in pairs:
        out[a].add(b)
    roots = sorted({a for a, _ in pairs} - has_parent)
    # replicate UNION ALL multiset semantics: count every path
    stats: dict[int, list] = {}  # doc -> [min_d, max_d, n_paths]

    def visit(node, depth):
        s = stats.setdefault(node, [depth, depth, 0])
        s[0] = min(s[0], depth)
        s[1] = max(s[1], depth)
        s[2] += 1
        if depth < CHAIN_MAX_HOPS:
            for nxt in out.get(node, ()):
                visit(nxt, depth + 1)

    for r in roots:
        visit(r, 0)
    got = {r["doc_id"]: r for r in q188_neardup_chain_depth(spark, SMOKE_SF_DIR).collect()}
    assert set(got) == set(stats)
    for doc, (mn, mx, np_) in stats.items():
        r = got[doc]
        assert (r["min_depth"], r["max_depth"], r["n_paths"]) == (mn, mx, np_)
    assert any(r["min_depth"] > 0 for r in got.values())  # walk went deep


# ---------------------------------------------------------------- q189


def test_cusum_matches_python_recurrence(spark, duck):
    from retail_sales_etl_pipeline_spark.plans.event_queries import (
        q189_cusum_changepoint,
    )

    got = {
        (r["event_type"], r["day_idx"]): r
        for r in q189_cusum_changepoint(spark, SMOKE_SF_DIR).collect()
    }
    rows = duck.execute(
        "SELECT event_type, ts::DATE, COUNT(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    d0 = min(d for _, d, _ in rows)
    n_days = (max(d for _, d, _ in rows) - d0).days + 1
    from collections import Counter

    counts: Counter = Counter()
    for et, d, n in rows:
        counts[(et, (d - d0).days)] = n
    types = {et for et, _, _ in rows}
    for et in types:
        tot = sum(n for (t, _), n in counts.items() if t == et)
        mean = tot * 1_000_000 // n_days
        k, h = mean // 10, 5 * mean
        s = 0
        for idx in range(n_days):
            x = counts.get((et, idx), 0)
            s = max(0, s + x * 1_000_000 - mean - k)
            r = got[(et, idx)]
            assert r["n"] == x
            assert r["cusum_micro"] == s, (et, idx)
            assert r["is_alarm"] == (s > h)
    assert len(got) == len(types) * n_days  # dense grid, zero-filled


# ---------------------------------------------------------------- q190


def test_ab_gtest_consistent_with_q142_and_float(spark, duck):
    from retail_sales_etl_pipeline_spark.plans.event_queries import (
        q142_ab_uplift,
        q190_ab_significance,
    )

    got = {
        (r["arm"], r["converted"]): r
        for r in q190_ab_significance(spark, SMOKE_SF_DIR).collect()
    }
    # zero cells are omitted (n=0 contributes 0 to G); at smoke scale
    # every user converts, so the table may degenerate to 2 cells
    assert set(got) <= {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert {a for a, _ in got} == {0, 1}
    obs = {k: r["n"] for k, r in got.items()}
    # marginal consistency with q142's published readout
    uplift = {r["arm"]: r for r in q142_ab_uplift(spark, SMOKE_SF_DIR).collect()}
    for arm in (0, 1):
        assert (
            obs.get((arm, 0), 0) + obs.get((arm, 1), 0)
            == uplift[arm]["n_users"]
        )
        assert obs.get((arm, 1), 0) == uplift[arm]["n_converted"]
    # float recompute of the G statistic
    tot = sum(obs.values())
    row = {a: obs.get((a, 0), 0) + obs.get((a, 1), 0) for a in (0, 1)}
    col = {c: obs.get((0, c), 0) + obs.get((1, c), 0) for c in (0, 1)}
    g_float = sum(
        2 * n * math.log(n * tot / (row[a] * col[c])) * 1e6
        for (a, c), n in obs.items()
        if n > 0
    )
    g_fixed = sum(r["g_contrib_micro"] for r in got.values())
    assert abs(g_fixed - g_float) <= sum(4 * n + 4 for n in obs.values())
    assert g_fixed >= -10  # G >= 0 up to fixed-point rounding


# ---------------------------------------------------------------- q191


def test_trend_slope_matches_numpy_ols(spark, duck):
    from retail_sales_etl_pipeline_spark.plans.event_queries import (
        q191_trend_slopes,
    )

    got = {r["event_type"]: r for r in q191_trend_slopes(spark, SMOKE_SF_DIR).collect()}
    rows = duck.execute(
        "SELECT event_type, ts::DATE, COUNT(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    d0 = min(d for _, d, _ in rows)
    n_days = (max(d for _, d, _ in rows) - d0).days + 1
    from collections import Counter

    counts: Counter = Counter()
    for et, d, n in rows:
        counts[(et, (d - d0).days)] = n
    for et in {t for t, _, _ in rows}:
        xs = list(range(n_days))
        ys = [counts.get((et, i), 0) for i in xs]
        n = n_days
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        # replicate truncation-toward-zero (SQL div), not python floor
        want = abs(num * 1000) // den * (1 if num >= 0 else -1)
        assert got[et]["slope_milli_per_day"] == want, et
        assert got[et]["n_days"] == n_days
        assert got[et]["total"] == sum(ys)
        # cross-check against numpy least squares
        import numpy as np

        slope = np.polyfit(xs, ys, 1)[0]
        assert abs(got[et]["slope_milli_per_day"] - slope * 1000) <= 1
