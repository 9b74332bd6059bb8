"""Properties of the corpus-composition queries (q74/q75/q76) beyond the
bit-exact oracle: the semantic-dedup drop rule re-derived with numpy, the
temperature-mixing invariants, and shard-packing coverage/balance."""

from __future__ import annotations

import math

import numpy as np

from retail_sales_etl_pipeline_spark.plans import mixing_queries as mq
from retail_sales_etl_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_semdedup_drop_rule_matches_numpy(spark):
    """Re-derive q74's decisions: assignment = argmax cosine vs the first
    SEM_K vectors; dropped iff a lower-id member of the SAME cluster has
    cosine >= threshold."""
    emb = load_table(spark, SF, "embeddings").orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in emb])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cents = Xn[ids < mq.SEM_K]
    cos_c = Xn @ cents.T
    # ties -> lowest centroid id: argmax returns the first maximal index
    assign = cos_c.argmax(axis=1)

    got = {
        r["vec_id"]: (r["centroid_id"], r["kept"])
        for r in mq.q74_semantic_neardup(spark, SF).collect()
    }
    assert set(got) == set(ids.tolist())
    n_dropped = 0
    for i, vid in enumerate(ids.tolist()):
        cid, kept = got[vid]
        assert cid == assign[i], vid
        same = [
            j
            for j, vj in enumerate(ids.tolist())
            if assign[j] == assign[i] and vj < vid
        ]
        expect_drop = any(float(Xn[j] @ Xn[i]) >= mq.SEMDEDUP_COS for j in same)
        assert kept == (not expect_drop), vid
        n_dropped += not kept
    assert n_dropped > 0  # threshold actually bites on the test corpus
    # the lowest id of every cluster can never be dropped
    for c in set(assign.tolist()):
        lowest = min(vid for i, vid in enumerate(ids.tolist()) if assign[i] == c)
        assert got[lowest][1] is True


def test_temperature_mixing_invariants(spark):
    rows = {r["lang"]: r for r in mq.q75_temperature_mixing(spark, SF).collect()}
    assert rows
    min_n = min(r["n_before"] for r in rows.values())
    for lang, r in rows.items():
        assert 0 <= r["n_after"] <= r["n_before"], lang
        expect_pct = math.floor(math.sqrt((10000 * min_n) // r["n_before"]))
        assert r["keep_pct"] == expect_pct, lang
    # the rarest language keeps everything eligible (pct == 100)
    rare = min(rows.values(), key=lambda r: r["n_before"])
    assert rare["keep_pct"] == 100
    # temperature flattens: the kept shares are closer to uniform than the
    # raw shares (compare max/min ratios)
    before = [r["n_before"] for r in rows.values()]
    after = [max(r["n_after"], 1) for r in rows.values()]
    assert max(after) / min(after) <= max(before) / min(before)


def test_shard_packing_covers_corpus_and_balances(spark):
    docs = load_table(spark, SF, "documents")
    n_docs = docs.count()
    rows = mq.q76_shard_packing(spark, SF).collect()
    assert len(rows) == mq.N_SHARDS
    assert sorted(r["shard_id"] for r in rows) == list(range(mq.N_SHARDS))
    assert sum(r["n_docs"] for r in rows) == n_docs
    loads = [r["total_tokens"] for r in rows]
    # hash sharding: no shard should dominate (loose deterministic bound)
    assert max(loads) <= 3 * min(loads)
    for r in rows:
        assert r["max_doc_tokens"] <= r["total_tokens"]


def test_sequence_packing_reconstructs(spark):
    """Re-derive q77 on the driver: docs concatenated in doc_id order
    within each shard, cut into SEQ_LEN-token sequences; every doc's
    sequence is floor(start_offset / SEQ_LEN). Also: per-shard token mass
    equals q76's report (same shard assignment), and seq_ids are dense
    enough that no sequence is skipped beyond straddling docs."""
    rows = mq.q77_sequence_packing(spark, SF).collect()

    # cross-check against q76's per-shard report (same shard assignment)
    shard_rows = {r["shard_id"]: r for r in mq.q76_shard_packing(spark, SF).collect()}
    got_by_shard: dict = {}
    for r in rows:
        s = got_by_shard.setdefault(r["shard_id"], {"tokens": 0, "docs": 0})
        s["tokens"] += r["doc_tokens"]
        s["docs"] += r["n_docs_starting"]
    assert set(got_by_shard) == set(shard_rows)
    for sid, agg in got_by_shard.items():
        assert agg["tokens"] == shard_rows[sid]["total_tokens"], sid
        assert agg["docs"] == shard_rows[sid]["n_docs"], sid

    # within each shard, seq_ids start at 0 and never jump by more than a
    # straddling doc allows: next start <= previous seq end + max doc len
    for sid in got_by_shard:
        seqs = sorted(r["seq_id"] for r in rows if r["shard_id"] == sid)
        assert seqs[0] == 0
        max_doc = shard_rows[sid]["max_doc_tokens"]
        for a, b in zip(seqs, seqs[1:]):
            assert (b - a - 1) * mq.SEQ_LEN <= max_doc, (sid, a, b)


def test_epoch_upsampling_converges_to_cap(spark):
    import pandas as pd

    from retail_sales_etl_pipeline_spark.plans.mixing_queries import MAX_EPOCHS
    from retail_sales_etl_pipeline_spark.plans.registry import load_all

    from .conftest import SMOKE_SF_DIR

    out = (
        load_all()["q102_epoch_upsampling"]
        .spark_fn(spark, SMOKE_SF_DIR)
        .toPandas()
    )
    docs = pd.read_parquet(f"{SMOKE_SF_DIR}/documents.parquet")
    counts = docs.groupby("lang").size()
    max_n = counts.max()
    assert set(out["lang"]) == set(counts.index)
    for _, r in out.iterrows():
        n = counts[r["lang"]]
        target = min(MAX_EPOCHS * n, max_n)
        assert r["n_before"] == n
        assert r["full_copies"] == target // n
        assert r["resid_pct"] == (100 * (target % n)) // n
        # materialized count lands between the full-copy floor and ceiling
        assert r["full_copies"] * n <= r["n_after"] <= (r["full_copies"] + 1) * n
    # the dominant language is never upsampled
    top = out[out["lang"] == counts.idxmax()].iloc[0]
    assert top["full_copies"] == 1 and top["resid_pct"] == 0
    assert top["n_after"] == top["n_before"]
