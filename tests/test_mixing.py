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
