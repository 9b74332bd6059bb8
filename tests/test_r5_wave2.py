"""Round-5 wave 2: edit-distance verify (q163), integer PageRank
(q164), market basket (q165), Pareto frontier (q166), Z-order layout
audit (q167), Zipf slope (q168).

Each query is hash-checked against its DuckDB oracle by the
correctness gate; these tests pin the properties the hash alone does
not: plan shapes (no cartesians, bounded pair work), closed-form
invariants (pair-component PageRank fixed point, frontier
non-dominance), result-neutrality of the scale-shaped pruning levels,
and statistical sanity on a constructed exact-Zipf corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans.analytic_queries import (
    Z_BOX,
    q165_market_basket,
    q166_pareto_frontier,
    q167_zorder_layout,
)
from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
    EDIT_SIM_MIN_PPM,
    q163_edit_distance_verify,
    q164_pagerank_neardup,
)
from retail_sales_etl_pipeline_spark.plans.text_queries import (
    ZIPF_HEAD,
    q168_zipf_slope,
)

from .conftest import SMOKE_SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ---------------------------------------------------------------- q163


def test_edit_distance_verify_plan_and_bounds(spark):
    df = q163_edit_distance_verify(spark, SMOKE_SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows, "sf0.001 has LSH candidates; some must pass the edit gate"
    for r in rows:
        assert 0 <= r["lev_dist"] <= r["max_len"]
        assert EDIT_SIM_MIN_PPM <= r["sim_ppm"] <= 1_000_000
        assert r["doc_a"] < r["doc_b"]


def test_edit_distance_matches_python_levenshtein(spark, duck):
    # Independent recompute of every reported distance with a pure-Python
    # DP — pins Spark's levenshtein (and the oracle's) to the classic
    # unit-cost edit distance on the capped prefix.
    from retail_sales_etl_pipeline_spark.plans.dedup_queries import EDIT_PREFIX

    rows = q163_edit_distance_verify(spark, SMOKE_SF_DIR).collect()
    texts = dict(duck.execute("SELECT doc_id, text FROM documents").fetchall())

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    for r in rows[:10]:  # DP is O(L^2) per pair; 10 pairs is plenty
        a = texts[r["doc_a"]][:EDIT_PREFIX]
        b = texts[r["doc_b"]][:EDIT_PREFIX]
        assert r["lev_dist"] == lev(a, b)
        assert r["max_len"] == max(len(a), len(b), 1)


# ---------------------------------------------------------------- q164


def test_pagerank_pair_components_sit_at_fixed_point(spark):
    # Closed form: in an isolated 2-node component both nodes have deg 1,
    # so each iteration computes 150000 + (17 * 1_000_000) div 20 ==
    # 1_000_000 exactly — isolated pairs are a fixed point of the integer
    # map. Any drift means the damping arithmetic is wrong.
    from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
        q21_ngram_jaccard_pairs,
    )

    pr = {r["doc_id"]: r for r in q164_pagerank_neardup(spark, SMOKE_SF_DIR).collect()}
    assert pr, "sf0.001 near-dup graph is non-empty"
    pairs = q21_ngram_jaccard_pairs(spark, SMOKE_SF_DIR).select(
        "doc_a", "doc_b"
    ).collect()
    neigh: dict[int, set[int]] = {}
    for p in pairs:
        neigh.setdefault(p["doc_a"], set()).add(p["doc_b"])
        neigh.setdefault(p["doc_b"], set()).add(p["doc_a"])
    isolated_pair_nodes = [
        n
        for n, ns in neigh.items()
        if len(ns) == 1 and len(neigh[next(iter(ns))]) == 1
    ]
    assert isolated_pair_nodes, "expected at least one isolated dup pair"
    for n in isolated_pair_nodes:
        assert pr[n]["pagerank_micro"] == 1_000_000
        assert pr[n]["degree"] == 1
    # global sanity: every score >= the damping floor, degrees match
    for n, r in pr.items():
        assert r["pagerank_micro"] >= 150_000
        assert r["degree"] == len(neigh[n])


# ---------------------------------------------------------------- q165


def test_market_basket_counts_match_bruteforce(spark, duck):
    got = {
        (r["part_a"], r["part_b"]): r
        for r in q165_market_basket(spark, SMOKE_SF_DIR).collect()
    }
    items = duck.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets: dict[int, set[int]] = {}
    for o, p in items:
        baskets.setdefault(o, set()).add(p)
    baskets = {o: ps for o, ps in baskets.items() if len(ps) <= 32}
    pair_n: dict[tuple[int, int], int] = {}
    item_n: dict[int, int] = {}
    for ps in baskets.values():
        sp = sorted(ps)
        for p in sp:
            item_n[p] = item_n.get(p, 0) + 1
        for i, a in enumerate(sp):
            for b in sp[i + 1 :]:
                pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    want = {k: v for k, v in pair_n.items() if v >= 2}
    assert set(got) == set(want)
    n_orders = len(baskets)
    for (a, b), r in got.items():
        assert r["n_ab"] == want[(a, b)]
        assert r["n_a"] == item_n[a] and r["n_b"] == item_n[b]
        assert r["n_orders"] == n_orders
        assert r["conf_ab_ppm"] == r["n_ab"] * 1_000_000 // r["n_a"]
        assert r["lift_ppm"] == r["n_ab"] * n_orders * 1_000_000 // (
            r["n_a"] * r["n_b"]
        )


def test_market_basket_pair_join_is_equi_keyed(spark):
    plan = _plan(q165_market_basket(spark, SMOKE_SF_DIR))
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------- q166


def test_frontier_is_exactly_the_non_dominated_set(spark, duck):
    got = {
        (r["c_mktsegment"], r["o_orderkey"])
        for r in q166_pareto_frontier(spark, SMOKE_SF_DIR).collect()
    }
    rows = duck.execute(
        """SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice, o.o_orderdate
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey"""
    ).fetchall()
    by_seg: dict[str, list] = {}
    for seg, k, price, date in rows:
        by_seg.setdefault(seg, []).append((k, price, date))
    want = set()
    for seg, orders in by_seg.items():
        for k, price, date in orders:
            dominated = any(
                p2 > price and d2 > date for _, p2, d2 in orders
            )
            if not dominated:
                want.add((seg, k))
    assert got == want


def test_frontier_salted_prune_is_result_neutral(spark):
    # The two-level plan must equal a direct single-level window — the
    # prune's correctness argument (dominated-in-bucket => dominated-
    # globally) checked end to end.
    from pyspark.sql import Window

    from retail_sales_etl_pipeline_spark.functions.scalar import epoch_us
    from retail_sales_etl_pipeline_spark.sources import load_table

    orders = load_table(spark, SMOKE_SF_DIR, "orders")
    cust = load_table(spark, SMOKE_SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "c_mktsegment",
        "o_orderkey",
        "o_totalprice",
        (-epoch_us("o_orderdate")).alias("neg_ep"),
    )
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("neg_ep")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    single = {
        (r["c_mktsegment"], r["o_orderkey"])
        for r in o.withColumn("bl", F.max("o_totalprice").over(w))
        .filter(F.col("bl").isNull() | (F.col("bl") <= F.col("o_totalprice")))
        .collect()
    }
    two_level = {
        (r["c_mktsegment"], r["o_orderkey"])
        for r in q166_pareto_frontier(spark, SMOKE_SF_DIR).collect()
    }
    assert two_level == single


# ---------------------------------------------------------------- q167


def test_zorder_audit_invariants(spark):
    rows = {r["layout"]: r for r in q167_zorder_layout(spark, SMOKE_SF_DIR).collect()}
    assert set(rows) == {"zorder", "date_sorted"}
    z, d = rows["zorder"], rows["date_sorted"]
    # ground truth is layout-independent
    assert z["rows_matched"] == d["rows_matched"]
    for r in (z, d):
        assert 0 < r["files_touched"] <= r["n_files"]
        assert r["rows_scanned"] >= r["rows_matched"]
    # the reason the query exists: on a box selective in BOTH dims the
    # multi-dim layout must not scan more than the single-dim layout
    assert z["rows_scanned"] <= d["rows_scanned"]


def test_morton_interleave_matches_python(spark):
    from retail_sales_etl_pipeline_spark.plans.analytic_queries import _morton16

    def py_morton(p: int, d: int) -> int:
        out = 0
        for b in range(8):
            out |= ((p >> b) & 1) << (2 * b + 1)
            out |= ((d >> b) & 1) << (2 * b)
        return out

    samples = [(0, 0), (255, 255), (1, 0), (0, 1), (170, 85), (200, 13)]
    df = spark.createDataFrame(samples, "pb int, db int").selectExpr(
        "pb", "db", f"({_morton16('div', 'pb', 'db')}) AS z"
    )
    for r in df.collect():
        assert r["z"] == py_morton(r["pb"], r["db"])


# ---------------------------------------------------------------- q168


def test_zipf_slope_near_minus_1000_on_exact_zipf_corpus(spark, tmp_path):
    # Construct a corpus whose head IS Zipf with exponent 1: token t_i
    # appears round(C / i) times. The fitted milli-slope must sit within
    # 3% of -1000 (discreteness + fixed-point rounding are the only
    # error sources).
    n_tok, C = 200, 5000
    words = []
    for i in range(1, n_tok + 1):
        words += [f"tok{i:04d}"] * round(C / i)
    docs = [
        (j, " ".join(words[j::50]), "en", "zipf", 1) for j in range(50)
    ]  # stripe tokens across 50 docs; per-source counts are unchanged
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = q168_zipf_slope(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_head"] == min(n_tok, ZIPF_HEAD)
    assert abs(r["slope_milli"] + 1000) <= 30, r["slope_milli"]


def test_zipf_two_level_head_equals_global_sort(spark, duck):
    # The salted two-level top-K must select exactly the tokens a global
    # (cnt DESC, token) sort selects — recomputed independently in DuckDB.
    got = {r["source"]: r for r in q168_zipf_slope(spark, SMOKE_SF_DIR).collect()}
    want = duck.execute(
        f"""
        WITH tok AS (
          SELECT source, unnest(string_split(lower(text), ' ')) AS token
          FROM documents
        ),
        counts AS (
          SELECT source, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2
        ),
        head AS (
          SELECT source, cnt,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY cnt DESC, token) AS rnk
          FROM counts QUALIFY rnk <= {ZIPF_HEAD}
        )
        SELECT source, COUNT(*) AS n_head FROM head GROUP BY source
        """
    ).fetchall()
    for source, n_head in want:
        assert got[source]["n_head"] == n_head
    # and the slope is a real fit: natural-ish test text slopes negative
    for r in got.values():
        assert r["slope_milli"] < 0


# ---------------------------------------------------------------- q169


def test_incremental_rollup_agrees_with_q16(spark):
    # The merged-partials refresh must reproduce the plain full rollup
    # (q16) month for month — same counts, same exact decimal revenue.
    from retail_sales_etl_pipeline_spark.plans.analytic_queries import (
        q169_incremental_rollup,
    )
    from retail_sales_etl_pipeline_spark.plans.parity_queries import (
        q16_monthly_rollup,
    )

    inc = {
        r["sale_month"]: r
        for r in q169_incremental_rollup(spark, SMOKE_SF_DIR).collect()
    }
    full = {
        r["sale_month"]: r for r in q16_monthly_rollup(spark, SMOKE_SF_DIR).collect()
    }
    assert set(inc) == set(full)
    for m, r in inc.items():
        assert r["n_orders"] == full[m]["n_orders"]
        assert r["month_revenue"] == full[m]["month_revenue"]
        assert 0 <= r["n_new_orders"] <= r["n_orders"]


# ---------------------------------------------------------------- q170


def test_interval_union_swallowing_span_stays_one_island(spark, tmp_path):
    # The case lag-based sessionization gets wrong: a long span swallows
    # several short ones, so a gap between consecutive STARTS does not end
    # the island — only a start past the running max of ALL ends does.
    import datetime as dt

    from retail_sales_etl_pipeline_spark.plans.event_queries import (
        q170_interval_union,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, offset_s, dur_s):
        return (eid, t0 + dt.timedelta(seconds=offset_s), uid, "view",
                float(dur_s), "{}")

    rows = [
        # user 1: (0,100) swallows (10,20) and (30,40); (95,120) chains on
        ev(1, 1, 0, 100), ev(2, 1, 10, 10), ev(3, 1, 30, 10), ev(4, 1, 95, 25),
        # user 1: separate island after the union's max end (120)
        ev(5, 1, 121, 5),
        # user 2: two touching spans (10,20)+(20,30) merge (touch == merge)
        ev(6, 2, 10, 10), ev(7, 2, 20, 10),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r["user_id"]: r for r in q170_interval_union(spark, str(tmp_path)).collect()}
    assert got[1]["n_islands"] == 2
    assert got[1]["n_spans"] == 5
    assert got[1]["covered_us"] == (120 - 0 + 5) * 1_000_000
    assert got[2]["n_islands"] == 1
    assert got[2]["covered_us"] == 20 * 1_000_000


def test_interval_union_matches_python_sweep(spark, duck):
    from retail_sales_etl_pipeline_spark.plans.event_queries import (
        INTERVAL_MAX_S,
        q170_interval_union,
    )

    got = {r["user_id"]: r for r in q170_interval_union(spark, SMOKE_SF_DIR).collect()}
    rows = duck.execute(
        "SELECT user_id, epoch_us(ts), value FROM events"
    ).fetchall()
    spans: dict[int, list] = {}
    for uid, s, v in rows:
        dur = round(min(v, INTERVAL_MAX_S) * 100) * 10_000
        spans.setdefault(uid, []).append((s, s + dur))
    for uid, sp in spans.items():
        sp.sort()
        islands = []
        for s, e in sp:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        assert got[uid]["n_islands"] == len(islands), uid
        assert got[uid]["n_spans"] == len(sp)
        assert got[uid]["covered_us"] == sum(e - s for s, e in islands)


# ---------------------------------------------------------------- q171


def test_semi_additive_snapshot_matches_bruteforce(spark, duck):
    from retail_sales_etl_pipeline_spark.plans.event_queries import (
        q171_semi_additive_snapshot,
    )

    got = {
        r["day"]: r for r in q171_semi_additive_snapshot(spark, SMOKE_SF_DIR).collect()
    }
    rows = duck.execute(
        "SELECT strftime(ts, '%Y-%m-%d'), user_id, epoch_us(ts), event_id,"
        " value FROM events"
    ).fetchall()
    last: dict[tuple, tuple] = {}
    for day, uid, ep, eid, v in rows:
        k = (day, uid)
        if k not in last or (ep, eid) > last[k][0]:
            last[k] = ((ep, eid), v)
    per_day: dict[str, list] = {}
    for (day, _uid), (_, v) in last.items():
        per_day.setdefault(day, []).append(round(v * 100))
    for day, cents in per_day.items():
        assert got[day]["n_users"] == len(cents)
        assert got[day]["total_closing"] == f"{sum(cents) / 100:.2f}"
        assert got[day]["max_closing"] == f"{max(cents) / 100:.2f}"
    assert set(got) == set(per_day)


# ---------------------------------------------------------------- q172


def test_triangle_count_matches_python_recount(spark):
    from itertools import combinations

    from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
        q21_ngram_jaccard_pairs,
        q172_triangle_count,
    )

    got = {r["doc_id"]: r for r in q172_triangle_count(spark, SMOKE_SF_DIR).collect()}
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in q21_ngram_jaccard_pairs(spark, SMOKE_SF_DIR).collect()
    }
    neigh: dict[int, set[int]] = {}
    for a, b in pairs:
        neigh.setdefault(a, set()).add(b)
        neigh.setdefault(b, set()).add(a)
    tri_at: dict[int, int] = {n: 0 for n in neigh}
    for n, ns in neigh.items():
        for v, w in combinations(sorted(ns), 2):
            if (v, w) in pairs or (w, v) in pairs:
                tri_at[n] += 1
    assert set(got) == set(neigh)
    assert any(c > 0 for c in tri_at.values()), "smoke graph has triangles"
    for n, r in got.items():
        assert r["n_triangles"] == tri_at[n], n
        assert r["degree"] == len(neigh[n])
        if r["degree"] >= 2:
            expect = 2_000_000 * tri_at[n] // (r["degree"] * (r["degree"] - 1))
            assert r["clustering_ppm"] == expect
            assert 0 <= r["clustering_ppm"] <= 1_000_000
        else:
            assert r["clustering_ppm"] is None


# ---------------------------------------------------------------- q173


def test_psi_contributions_match_python_float_recompute(spark, duck):
    from retail_sales_etl_pipeline_spark.plans.event_queries import (
        PSI_BIN_W,
        PSI_MAX_BIN,
        q173_distribution_drift_psi,
    )

    got = {r["bin"]: r for r in q173_distribution_drift_psi(spark, SMOKE_SF_DIR).collect()}
    rows = duck.execute(
        "SELECT value, CAST(ts < TIMESTAMP '2024-01-16 00:00:00' AS INT)"
        " FROM events"
    ).fetchall()
    from collections import Counter

    ce: Counter = Counter()
    cl: Counter = Counter()
    for v, early in rows:
        b = min(PSI_MAX_BIN, int(v // PSI_BIN_W))
        (ce if early else cl)[b] += 1
    ne, nl = sum(ce.values()), sum(cl.values())
    assert set(got) == set(ce) | set(cl)
    total_psi = 0.0
    for b, r in got.items():
        assert r["cnt_e"] == ce.get(b, 0)
        assert r["cnt_l"] == cl.get(b, 0)
        if r["cnt_e"] > 0 and r["cnt_l"] > 0:
            p, q = r["cnt_e"] / ne, r["cnt_l"] / nl
            want = (p - q) * math.log(p / q) * 1_000_000
            # fixed-point floor + micro-nat rounding: within 2 micro-PSI
            assert abs(r["psi_contrib_micro"] - want) <= 2, b
            total_psi += want
        else:
            assert r["psi_contrib_micro"] is None
    assert total_psi >= 0  # PSI is a sum of non-negative terms


# ---------------------------------------------------------------- q174


def test_label_audit_matches_bruteforce_topk(spark, duck):
    import numpy as np

    from retail_sales_etl_pipeline_spark.operators.similarity import (
        RP_MAX_BUCKET,
        rp_buckets_pandas,
    )
    from retail_sales_etl_pipeline_spark.plans.similarity_queries import (
        K_AUDIT,
        q174_label_consistency_audit,
    )
    from retail_sales_etl_pipeline_spark.sources import load_table

    got = {r["vec_id"]: r for r in q174_label_consistency_audit(spark, SMOKE_SF_DIR).collect()}
    emb = load_table(spark, SMOKE_SF_DIR, "embeddings")
    buckets = rp_buckets_pandas(emb).toPandas()
    sizes = buckets.groupby(["tbl", "bucket"]).size()
    ok = buckets[
        buckets.set_index(["tbl", "bucket"]).index.map(sizes) <= RP_MAX_BUCKET
    ]
    cand: dict[int, set[int]] = {}
    for (_, _), grp in ok.groupby(["tbl", "bucket"]):
        ids = grp["vec_id"].tolist()
        for q in ids:
            cand.setdefault(q, set()).update(i for i in ids if i != q)
    vecs = {
        r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), r["label"])
        for r in emb.collect()
    }
    checked = 0
    for q, ns in list(cand.items())[:50]:
        vq, lq = vecs[q]
        nq = float(np.sqrt((vq * vq).sum()))
        scored = sorted(
            (
                (-float(vq @ vecs[n][0]) / (nq * float(np.sqrt((vecs[n][0] ** 2).sum()))), n)
                for n in ns
            ),
        )[:K_AUDIT]
        agree = sum(1 for _, n in scored if vecs[n][1] == lq)
        assert got[q]["k_found"] == len(scored)
        assert got[q]["n_agree"] == agree, q
        assert got[q]["label"] == lq
        checked += 1
    assert checked == 50
