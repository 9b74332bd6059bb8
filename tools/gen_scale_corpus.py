"""Deterministic scale-corpus generator for the round's big-run evidence.

The registry's scale claims (banded dedup, O(log n) connected components,
probe-bounded ANN, single-shuffle aggregates) are proven by plan shape at
sf0.1 but had never been EXECUTED above ~600K rows. This tool generates
`documents` / `embeddings` / `events` tables with the same distribution
family as the driver's testdata (vocab and word frequencies measured from
/root/testdata/sf0.1, same doc-length range, lang/source mixes, cluster
count, event-type mix) at 1x / 10x / 100x the sf0.1 density — the 1x copy
exists so scaling ratios compare generator-identical distributions and a
driver-vs-generator mismatch can't masquerade as super-linear growth.

Dup structure is planted deterministically, scale-proportionally:
  - 0.2% of docs get one EXACT duplicate (offset id)
  - 4% of docs get one NEAR-DUP twin (every 4th token dropped — q112's
    perturbation, trigram overlap ~1/2)
so the dedup ladder, LSH banding, and CC families have real work whose
size grows linearly with the corpus.

Usage: python tools/gen_scale_corpus.py [outroot]   (default ./bigdata)
Writes {outroot}/gen{1,10,100}x/{documents,embeddings,events}.parquet.
Everything is seeded — two runs produce byte-identical tables.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"
BASE_DOCS, BASE_VECS, BASE_EVENTS, BASE_USERS = 5_000, 2_000, 100_000, 1_500
# retail family at sf0.1 density (matches /root/testdata/sf0.1 row counts);
# the part catalog scales WITH the corpus (TPC-H convention) so basket
# pair-support densities stay constant instead of going birthday-quadratic
BASE_CUST, BASE_ORDERS, BASE_PARTS = 15_000, 150_000, 20_000
EXACT_DUP_FRAC, NEAR_DUP_FRAC = 0.002, 0.04
SEED = 20_240_814


def _measured_vocab() -> tuple[list[str], np.ndarray]:
    """Vocabulary and word-frequency weights measured from the driver's
    sf0.1 corpus — the generated text is the same unigram family."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT t, COUNT(*) AS c FROM (
          SELECT unnest(string_split(lower(text), ' ')) AS t
          FROM read_parquet('{SF01}/documents.parquet')
        ) GROUP BY t ORDER BY t
        """
    ).fetchall()
    words = [r[0] for r in rows]
    w = np.array([r[1] for r in rows], dtype=np.float64)
    return words, w / w.sum()


def gen_documents(mult: int, words: list[str], weights: np.ndarray):
    rng = np.random.default_rng(SEED)
    n = BASE_DOCS * mult
    lens = rng.integers(10, 101, size=n)
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
    lang = rng.choice(langs, size=n, p=lang_p)
    source = np.array([f"src{i % 20}" for i in range(n)])
    word_arr = np.array(words)
    texts = [
        " ".join(word_arr[rng.choice(len(words), size=m, p=weights)])
        for m in lens
    ]
    doc_id = list(range(n))
    # planted exact duplicates: ids offset past the organic range
    n_exact = int(n * EXACT_DUP_FRAC)
    exact_src = rng.choice(n, size=n_exact, replace=False)
    # planted near-dup twins: every 4th token dropped (q112's perturbation)
    n_near = int(n * NEAR_DUP_FRAC)
    near_src = rng.choice(n, size=n_near, replace=False)
    for k, s in enumerate(exact_src):
        doc_id.append(n + k)
        texts.append(texts[s])
    for k, s in enumerate(near_src):
        doc_id.append(n + n_exact + k)
        toks = texts[s].split(" ")
        texts.append(" ".join(t for i, t in enumerate(toks) if (i + 1) % 4))
    total = len(doc_id)
    lang = np.concatenate(
        [lang, lang[exact_src], lang[near_src]]
    )
    source = np.concatenate([source, source[exact_src], source[near_src]])
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang.tolist(), pa.string()),
            "source": pa.array(source.tolist(), pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    ), total


def gen_embeddings(mult: int):
    rng = np.random.default_rng(SEED + 1)
    n, dim, k = BASE_VECS * mult, 64, 10
    means = rng.normal(0.0, 1.0, size=(k, dim))
    means /= np.linalg.norm(means, axis=1, keepdims=True)
    label = rng.integers(0, k, size=n)
    vecs = (
        means[label] * 0.8
        + rng.normal(0.0, 0.35, size=(n, dim))
    ).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.tolist()], pa.list_(pa.float32())
            ),
            "label": pa.array(label.astype(np.int32), pa.int32()),
        }
    )


def gen_events(mult: int):
    rng = np.random.default_rng(SEED + 2)
    n, users = BASE_EVENTS * mult, BASE_USERS * mult
    types = np.array(["view", "click", "purchase", "signup", "error"])
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = t0 + rng.integers(0, span_us, size=n).astype("timedelta64[us]")
    ts = np.sort(ts)
    value = np.round(rng.exponential(50.0, size=n), 2)
    value = np.minimum(value, 600.0)
    props = [f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, size=n)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, users, size=n), pa.int64()
            ),
            "event_type": pa.array(
                types[rng.integers(0, 5, size=n)].tolist(), pa.string()
            ),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )


def gen_part(mult: int):
    """part catalog at sf0.1 density x mult, same value families as the
    driver's testdata (probed: 25 brands Brand#1..25, 6 types, size 1-50,
    retailprice 900-999.9, names 'adjective noun' over an 8x8 vocab).
    Scales with mult — the same convention as lineitem's l_partkey range —
    so q178's FD audit, q182's per-part decorrelated aggregate, and
    q196's weighted median see a realistically-growing catalog, not a
    fixed dim that would make the per-part aggregate artificially cheap."""
    rng = np.random.default_rng(SEED + 4)
    n_part = BASE_PARTS * mult
    adjectives = np.array(
        ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
    )
    nouns = np.array(
        ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
    )
    types = np.array(
        ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    )
    names = [
        f"{a} {b}"
        for a, b in zip(
            adjectives[rng.integers(0, 8, size=n_part)],
            nouns[rng.integers(0, 8, size=n_part)],
        )
    ]
    brands = [f"Brand#{b}" for b in rng.integers(1, 26, size=n_part)]
    return pa.table(
        {
            "p_partkey": pa.array(range(n_part), pa.int64()),
            "p_name": pa.array(names, pa.string()),
            "p_brand": pa.array(brands, pa.string()),
            "p_type": pa.array(
                types[rng.integers(0, 6, size=n_part)].tolist(), pa.string()
            ),
            "p_size": pa.array(
                rng.integers(1, 51, size=n_part).astype(np.int32), pa.int32()
            ),
            "p_retailprice": pa.array(
                np.round(rng.uniform(900.0, 999.9, size=n_part), 2),
                pa.float64(),
            ),
        }
    )


def gen_retail(mult: int):
    """customer / orders / lineitem at sf0.1 density x mult, same value
    families as the driver's testdata (statuses, segments, priority mix,
    midnight order dates 1995-2001, 1-7 lines per order). The part
    catalog scales with mult so per-pair basket support stays at its
    sf0.1 density instead of going birthday-quadratic at 100x."""
    rng = np.random.default_rng(SEED + 3)
    n_cust, n_ord, n_part = BASE_CUST * mult, BASE_ORDERS * mult, BASE_PARTS * mult
    segments = np.array(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    )
    customer = pa.table(
        {
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": pa.array(
                [f"Customer#{i:09d}" for i in range(n_cust)], pa.string()
            ),
            "c_nationkey": pa.array(
                rng.integers(0, 25, size=n_cust).astype(np.int32), pa.int32()
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, size=n_cust), 2),
                pa.float64(),
            ),
            "c_mktsegment": pa.array(
                segments[rng.integers(0, 5, size=n_cust)].tolist(), pa.string()
            ),
        }
    )
    day0 = np.datetime64("1995-01-01", "D")
    odate_days = rng.integers(0, 2404, size=n_ord)
    orders = pa.table(
        {
            "o_orderkey": pa.array(range(n_ord), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, size=n_ord), pa.int64()),
            "o_orderstatus": pa.array(
                np.array(["O", "F", "P"])[
                    rng.choice(3, size=n_ord, p=[0.49, 0.49, 0.02])
                ].tolist(),
                pa.string(),
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(900.0, 500_000.0, size=n_ord), 2),
                pa.float64(),
            ),
            "o_orderdate": pa.array(
                (day0 + odate_days).astype("datetime64[us]"), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                np.array(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
                )[rng.integers(0, 5, size=n_ord)].tolist(),
                pa.string(),
            ),
        }
    )
    lines_per = rng.integers(1, 8, size=n_ord)
    n_li = int(lines_per.sum())
    li_order = np.repeat(np.arange(n_ord), lines_per)
    li_num = np.concatenate([np.arange(1, k + 1) for k in lines_per])
    qty = rng.integers(1, 51, size=n_li).astype(np.float64)
    price = np.round(rng.uniform(900.0, 105_000.0, size=n_li), 2)
    rf = np.array(["A", "N", "R"])[rng.integers(0, 3, size=n_li)]
    ls = np.array(["O", "F"])[rng.integers(0, 2, size=n_li)]
    ship_days = odate_days[li_order] + rng.integers(1, 122, size=n_li)
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(li_order, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, size=n_li), pa.int64()),
            "l_suppkey": pa.array(
                rng.integers(0, max(1, n_part // 20), size=n_li), pa.int64()
            ),
            "l_linenumber": pa.array(li_num.astype(np.int32), pa.int32()),
            "l_quantity": pa.array(qty, pa.float64()),
            "l_extendedprice": pa.array(price, pa.float64()),
            "l_discount": pa.array(
                np.round(rng.uniform(0.0, 0.1, size=n_li), 2), pa.float64()
            ),
            "l_tax": pa.array(
                np.round(rng.uniform(0.0, 0.08, size=n_li), 2), pa.float64()
            ),
            "l_returnflag": pa.array(rf.tolist(), pa.string()),
            "l_linestatus": pa.array(ls.tolist(), pa.string()),
            "l_shipdate": pa.array(
                (day0 + ship_days).astype("datetime64[us]"), pa.timestamp("us")
            ),
        }
    )
    return customer, orders, lineitem, n_li


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    outroot = args[0] if args else "bigdata"
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
    mults = (1, 10, 100)
    for a in sys.argv[1:]:
        if a.startswith("--mults="):
            mults = tuple(int(m) for m in a[len("--mults="):].split(","))

    def want(name: str) -> bool:
        return only is None or name in only

    words = weights = None
    if want("documents"):
        words, weights = _measured_vocab()
    for mult in mults:
        d = os.path.join(outroot, f"gen{mult}x")
        os.makedirs(d, exist_ok=True)
        if want("documents"):
            docs, total = gen_documents(mult, words, weights)
            pq.write_table(docs, os.path.join(d, "documents.parquet"))
        if want("embeddings"):
            pq.write_table(
                gen_embeddings(mult), os.path.join(d, "embeddings.parquet")
            )
        if want("events"):
            pq.write_table(gen_events(mult), os.path.join(d, "events.parquet"))
        if want("retail"):
            customer, orders, lineitem, n_li = gen_retail(mult)
            pq.write_table(customer, os.path.join(d, "customer.parquet"))
            pq.write_table(orders, os.path.join(d, "orders.parquet"))
            pq.write_table(lineitem, os.path.join(d, "lineitem.parquet"))
            print(f"{d}: customers={BASE_CUST*mult} "
                  f"orders={BASE_ORDERS*mult} lineitem={n_li}", flush=True)
        if want("part"):
            pq.write_table(gen_part(mult), os.path.join(d, "part.parquet"))
            print(f"{d}: part={BASE_PARTS*mult}", flush=True)
        print(f"{d}: done ({'all' if only is None else ','.join(sorted(only))})",
              flush=True)


if __name__ == "__main__":
    main()
