"""Round-5 wave 3: point-in-time SCD2 join (q175), RFM segmentation
(q176), Markov transitions (q177), FD audit (q178), fixed-point EWMA
(q179), U-shaped attribution (q180), Matryoshka recall (q181), TPC-H
Q17/Q15 shapes (q182/q183).

Each query is hash-checked against its DuckDB oracle by the
correctness gate; these tests pin what the hash alone does not:
independent brute-force recounts in plain Python, closed-form
invariants (credit conservation, quintile balance, recall bounds),
and the data preconditions the exactness arguments rest on (integer
quantities for q182's int-only threshold).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans.analytic_queries import (
    FD_CANDIDATES,
    q175_point_in_time_join,
    q176_rfm_segmentation,
    q178_functional_dependency_audit,
    q182_small_quantity_revenue,
    q183_top_supplier,
)
from retail_sales_etl_pipeline_spark.plans.event_queries import (
    EWMA_K,
    q177_markov_transitions,
    q179_ewma_features,
    q180_multitouch_attribution,
)
from retail_sales_etl_pipeline_spark.plans.similarity_queries import (
    MRL_DIMS,
    MRL_MAX_QID,
    MRL_SAMPLE_MOD,
    TOP_K,
    q181_matryoshka_recall,
)

from .conftest import SMOKE_SF_DIR


# ---------------------------------------------------------------- q175


def test_pit_join_credits_every_item_exactly_once(spark, duck):
    got = q175_point_in_time_join(spark, SMOKE_SF_DIR).collect()
    n_li = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert sum(r["n_items"] for r in got) == n_li  # no fan-out, no drop
    # revenue conservation: PIT grouping must only REDISTRIBUTE revenue
    total = sum(float(r["revenue"]) for r in got)
    want = duck.execute(
        "SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(1 - l_discount AS DECIMAL(4,2))) FROM lineitem"
    ).fetchone()[0]
    assert abs(total - float(want)) < 1e-6


def test_pit_join_picks_version_valid_at_shipdate(spark, duck):
    # brute-force: rebuild history in python, match a sample of facts
    rows = duck.execute(
        "SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority"
        " FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"
    ).fetchall()
    hist: dict[int, list] = {}
    for ck, od, ok, pr in rows:
        h = hist.setdefault(ck, [])
        if not h or h[-1][1] != pr:
            h.append([od, pr])
    # collapse same-day: later version wins
    day_hist: dict[int, list] = {}
    for ck, h in hist.items():
        d: dict = {}
        for od, pr in h:
            d[od] = pr  # later runs overwrite same valid_from
        day_hist[ck] = sorted(d.items())
    facts = duck.execute(
        "SELECT o.o_custkey, l.l_shipdate, COUNT(*)"
        " FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey"
        " GROUP BY 1, 2"
    ).fetchall()
    want: dict[tuple, int] = {}
    for ck, sd, n in facts:
        pr = None
        for od, p in day_hist.get(ck, []):
            if od <= sd:
                pr = p
        want[(pr, sd.strftime("%Y-%m"))] = (
            want.get((pr, sd.strftime("%Y-%m")), 0) + n
        )
    got = {
        (r["priority_at_ship"], r["ship_month"]): r["n_items"]
        for r in q175_point_in_time_join(spark, SMOKE_SF_DIR).collect()
    }
    assert got == want


# ---------------------------------------------------------------- q176


def test_rfm_quintiles_balanced_and_recency_exact(spark, duck):
    got = q176_rfm_segmentation(spark, SMOKE_SF_DIR).collect()
    ref = duck.execute("SELECT MAX(o_orderdate) FROM orders").fetchone()[0]
    per_cust = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(
            "SELECT o_custkey, MAX(o_orderdate), COUNT(*),"
            " SUM(CAST(o_totalprice AS DECIMAL(18,2)))"
            " FROM orders GROUP BY 1"
        ).fetchall()
    }
    assert {r["o_custkey"] for r in got} == set(per_cust)
    from collections import Counter

    for r in got:
        last, n, mon = per_cust[r["o_custkey"]]
        assert r["recency_days"] == (ref - last).days
        assert r["n_orders"] == n
        assert float(r["monetary"]) == float(mon)
        assert 1 <= r["r_score"] <= 5
    # quintile balance within each segment: sizes differ by at most 1
    for score_col in ("r_score", "f_score", "m_score"):
        for seg in {r["c_mktsegment"] for r in got}:
            sizes = Counter(
                r[score_col] for r in got if r["c_mktsegment"] == seg
            )
            assert set(sizes) == {1, 2, 3, 4, 5}
            assert max(sizes.values()) - min(sizes.values()) <= 1


def test_rfm_score_5_is_best(spark):
    got = q176_rfm_segmentation(spark, SMOKE_SF_DIR).collect()
    for seg in {r["c_mktsegment"] for r in got}:
        rows = [r for r in got if r["c_mktsegment"] == seg]
        top_r = [r for r in rows if r["r_score"] == 5]
        low_r = [r for r in rows if r["r_score"] == 1]
        assert max(r["recency_days"] for r in top_r) <= min(
            r["recency_days"] for r in low_r
        )
        top_m = max(rows, key=lambda r: float(r["monetary"]))
        assert top_m["m_score"] == 5


# ---------------------------------------------------------------- q177


def test_markov_matrix_matches_python_recount(spark, duck):
    got = {
        (r["prev_type"], r["event_type"]): (r["n"], r["p_ppm"])
        for r in q177_markov_transitions(spark, SMOKE_SF_DIR).collect()
    }
    rows = duck.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    from collections import Counter

    trans: Counter = Counter()
    prev_user, prev_type = None, None
    for uid, et in rows:
        p = "START" if uid != prev_user else prev_type
        trans[(p, et)] += 1
        prev_user, prev_type = uid, et
    assert {k: v[0] for k, v in got.items()} == dict(trans)
    row_tot: Counter = Counter()
    for (p, _), n in trans.items():
        row_tot[p] += n
    for (p, e), (n, ppm) in got.items():
        assert ppm == n * 1_000_000 // row_tot[p]
    # every user contributes exactly one START transition
    n_users = duck.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert sum(n for (p, _), (n, _) in got.items() if p == "START") == n_users


# ---------------------------------------------------------------- q178


def test_fd_audit_matches_duckdb_recount(spark, duck):
    got = {r["fd"]: r for r in q178_functional_dependency_audit(spark, SMOKE_SF_DIR).collect()}
    assert set(got) == {fd for fd, *_ in FD_CANDIDATES}
    for fd, tbl, det, dep in FD_CANDIDATES:
        rows = duck.execute(
            f"SELECT {det}, COUNT(DISTINCT {dep}), COUNT(*)"
            f" FROM {tbl} GROUP BY {det}"
        ).fetchall()
        r = got[fd]
        assert r["n_det"] == len(rows)
        assert r["n_violating_det"] == sum(1 for _, nd, _ in rows if nd > 1)
        assert r["max_dep_per_det"] == max(nd for _, nd, _ in rows)
        assert r["n_rows_in_violation"] == sum(
            n for _, nd, n in rows if nd > 1
        )


# ---------------------------------------------------------------- q179


def test_ewma_matches_python_fixed_point(spark, duck):
    got = {r["user_id"]: r for r in q179_ewma_features(spark, SMOKE_SF_DIR).collect()}
    rows = duck.execute(
        "SELECT user_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " FROM events ORDER BY user_id, ts DESC, event_id DESC"
    ).fetchall()
    per_user: dict[int, list[int]] = {}
    for uid, cents in rows:
        per_user.setdefault(uid, []).append(cents)
    assert set(got) == set(per_user)
    for uid, cents in per_user.items():
        recent = cents[:EWMA_K]
        num = sum(c * (1 << (EWMA_K - k)) for k, c in enumerate(recent, 1))
        den = sum(1 << (EWMA_K - k) for k in range(1, len(recent) + 1))
        assert got[uid]["n_used"] == len(recent)
        assert got[uid]["ewma_micro"] == num * 10_000 // den, uid
    # EWMA is a convex combination: bounded by min/max of the window
    for uid, cents in per_user.items():
        recent = cents[:EWMA_K]
        assert (
            min(recent) * 10_000
            <= got[uid]["ewma_micro"]
            <= max(recent) * 10_000
        )


# ---------------------------------------------------------------- q180


def test_attribution_credit_conserved_per_user(spark, duck):
    got = {r["event_type"]: r for r in q180_multitouch_attribution(spark, SMOKE_SF_DIR).collect()}
    rows = duck.execute(
        "SELECT user_id, event_type, ts, event_id FROM events"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    per_user: dict[int, list] = {}
    for uid, et, ts, eid in rows:
        per_user.setdefault(uid, []).append((ts, eid, et))
    from collections import Counter

    want_n: Counter = Counter()
    want_credit: Counter = Counter()
    for uid, evs in per_user.items():
        conv = next(
            ((ts, eid) for ts, eid, et in evs if et == "purchase"), None
        )
        if conv is None:
            continue
        touches = [
            et for ts, eid, et in evs
            if et in ("view", "click") and (ts, eid) < conv
        ]
        n = len(touches)
        for pos, et in enumerate(touches, 1):
            want_n[et] += 1
            if n == 1:
                c = 1_000_000
            elif n == 2:
                c = 500_000
            elif pos in (1, n):
                c = 400_000
            else:
                c = 200_000 // (n - 2)
            want_credit[et] += c
        # per-user conservation up to the documented floor remainder
        total = (
            1_000_000 if n == 1 else 1_000_000 if n == 2 else
            800_000 + (n - 2) * (200_000 // (n - 2))
        ) if n else 0
        assert 0 <= 1_000_000 - total < max(n - 2, 1) if n else True
    assert {k: r["n_touches"] for k, r in got.items()} == dict(want_n)
    assert {k: r["credit_ppm"] for k, r in got.items()} == dict(want_credit)


# ---------------------------------------------------------------- q181


def test_matryoshka_recall_matches_numpy(spark, duck):
    import numpy as np

    got = {r["query_id"]: r for r in q181_matryoshka_recall(spark, SMOKE_SF_DIR).collect()}
    vecs = {
        r[0]: np.array(r[1], dtype=np.float64)
        for r in duck.execute(
            "SELECT vec_id, embedding FROM embeddings"
        ).fetchall()
    }
    ids = sorted(vecs)
    queries = [i for i in ids if i % MRL_SAMPLE_MOD == 0 and i < MRL_MAX_QID]
    assert set(got) == set(queries)

    def topk(qid, dims):
        vq = vecs[qid][:dims]
        nq = math.sqrt(float(vq @ vq))
        scored = sorted(
            (
                (-float(vq @ vecs[n][:dims])
                 / (nq * math.sqrt(float(vecs[n][:dims] @ vecs[n][:dims]))),
                 n)
                for n in ids if n != qid
            )
        )[:TOP_K]
        return {n for _, n in scored}

    for qid in queries:
        full = topk(qid, 64)
        trunc = topk(qid, MRL_DIMS)
        overlap = len(full & trunc)
        assert got[qid]["k_full"] == TOP_K
        assert got[qid]["n_overlap"] == overlap, qid
        assert got[qid]["recall_ppm"] == overlap * 1_000_000 // TOP_K
    # truncation must lose SOMETHING on a 64-dim random corpus
    assert any(r["n_overlap"] < TOP_K for r in got.values())
    assert any(r["n_overlap"] > 0 for r in got.values())


# ---------------------------------------------------------------- q182


def test_small_qty_threshold_is_integer_exact(spark, duck):
    # precondition the int-only threshold rests on: whole quantities
    assert duck.execute(
        "SELECT COUNT(*) FROM lineitem WHERE l_quantity <> floor(l_quantity)"
    ).fetchone()[0] == 0
    got = {r["p_brand"]: r for r in q182_small_quantity_revenue(spark, SMOKE_SF_DIR).collect()}
    rows = duck.execute(
        "SELECT l.l_partkey, p.p_brand, CAST(l_quantity AS BIGINT),"
        " l_extendedprice"
        " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
    ).fetchall()
    from collections import defaultdict

    per_part: dict[int, list[int]] = defaultdict(list)
    for pk, _, q, _ in rows:
        per_part[pk].append(q)
    want_n: dict[str, int] = defaultdict(int)
    for pk, brand, q, _ in rows:
        s, c = sum(per_part[pk]), len(per_part[pk])
        if 5 * q * c < s:
            want_n[brand] += 1
    assert {k: r["n_small_lines"] for k, r in got.items()} == dict(want_n)


# ---------------------------------------------------------------- q183


def test_top_supplier_is_argmax_with_ties(spark, duck):
    got = q183_top_supplier(spark, SMOKE_SF_DIR).collect()
    rows = duck.execute(
        "SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(1 - l_discount AS DECIMAL(4,2)))"
        " FROM lineitem"
        " WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
        "   AND l_shipdate < TIMESTAMP '1996-04-01'"
        " GROUP BY 1"
    ).fetchall()
    mx = max(v for _, v in rows)
    want = {k for k, v in rows if v == mx}
    assert {r["l_suppkey"] for r in got} == want
    for r in got:
        assert float(r["total_revenue"]) == float(mx)
