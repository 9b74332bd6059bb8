"""Semantic checks for the tokenizer/behavioral batch (q92-q99) beyond
the DuckDB oracle: independent pandas/pure-Python recounts for the ops
with subtle logic (funnel windowing, integer-rank percentiles, BPE pair
expansion), plus invariants for the rest. A third implementation agreeing
with both engines rules out a shared-misreading bug in the oracle SQL."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from retail_sales_etl_pipeline_spark.plans.registry import load_all

from .conftest import SMOKE_SF_DIR

REGISTRY = load_all()


@pytest.fixture(scope="module")
def events_pd():
    return pd.read_parquet(f"{SMOKE_SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(f"{SMOKE_SF_DIR}/documents.parquet")


def test_redaction_leaves_no_digits(spark):
    out = REGISTRY["q92_pattern_redaction"].spark_fn(spark, SMOKE_SF_DIR).toPandas()
    assert len(out) > 0
    assert not out["redacted"].str.contains("[0-9]", regex=True).any()
    # counts are consistent with the source: every <NUM> token came from a match
    assert (out["redacted"].str.count("<NUM>") == out["n_num"]).all()


def test_source_cap_keeps_longest_per_source(spark, docs_pd):
    from retail_sales_etl_pipeline_spark.plans.curation_queries import SOURCE_DOC_CAP

    out = REGISTRY["q93_source_doc_cap"].spark_fn(spark, SMOKE_SF_DIR).toPandas()
    sizes = out.groupby("source").size()
    assert (sizes <= SOURCE_DOC_CAP).all()
    expected = set()
    for _, g in docs_pd.groupby("source"):
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        expected |= set(g.head(SOURCE_DOC_CAP)["doc_id"])
    assert set(out["doc_id"]) == expected


def test_bpe_pairs_match_python_recount(spark, docs_pd):
    from collections import Counter

    c: Counter[str] = Counter()
    for text in docs_pd["text"].dropna():
        for w in text.lower().split(" "):
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    out = REGISTRY["q94_bpe_pair_counts"].spark_fn(spark, SMOKE_SF_DIR).toPandas()
    expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: len(out)]
    got = list(zip(out.sort_values("rnk")["pair"], out.sort_values("rnk")["cnt"]))
    assert got == expected


def test_funnel_matches_pandas_recount(spark, events_pd):
    out = REGISTRY["q95_event_funnel"].spark_fn(spark, SMOKE_SF_DIR).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    signups = (
        events_pd[events_pd.event_type == "signup"].groupby("user_id")["ts"].min()
    )
    purchases = events_pd[events_pd.event_type == "purchase"][["user_id", "ts"]]
    converted = 0
    for uid, s_ts in signups.items():
        p = purchases[purchases.user_id == uid]
        if ((p.ts >= s_ts) & (p.ts <= s_ts + pd.Timedelta(days=7))).any():
            converted += 1
    assert row["n_users"] == events_pd["user_id"].nunique()
    assert row["n_signup_users"] == len(signups)
    assert row["n_converted_7d"] == converted


def test_retention_day0_covers_every_user(spark, events_pd):
    out = REGISTRY["q96_retention_cohorts"].spark_fn(spark, SMOKE_SF_DIR).toPandas()
    # every user is active on their own cohort day, so day-0 counts sum to
    # the full user population
    assert out[out.offset_days == 0]["n_active"].sum() == events_pd["user_id"].nunique()
    assert out["offset_days"].between(0, 14).all()


def test_winsorize_matches_numpy_recount(spark, events_pd):
    out = (
        REGISTRY["q97_value_winsorize"]
        .spark_fn(spark, SMOKE_SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    for etype, g in events_pd.groupby("event_type"):
        v = np.sort(g["value"].to_numpy())
        n = len(v)
        p05 = v[(n + 19) // 20 - 1]
        p95 = v[(19 * n + 19) // 20 - 1]
        row = out.loc[etype]
        assert row["n"] == n
        assert row["p05"] == p05 and row["p95"] == p95
        clipped = np.clip(g["value"].to_numpy(), p05, p95)
        assert row["clipped_sum_micros"] == int(
            np.floor(clipped * 1_000_000).astype(np.int64).sum()
        )


def test_oov_rate_invariants_and_vocab(spark, docs_pd):
    from collections import Counter

    from retail_sales_etl_pipeline_spark.plans.tokenizer_queries import VOCAB_K

    out = REGISTRY["q98_vocab_oov_rate"].spark_fn(spark, SMOKE_SF_DIR).toPandas()
    assert out["oov_frac"].between(0, 1).all()
    assert (out["n_oov"] <= out["n_tokens"]).all()
    c: Counter[str] = Counter()
    for text in docs_pd["text"].dropna():
        c.update(text.lower().split(" "))
    vocab = {t for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]}
    # recount one document's OOV fraction independently
    doc = docs_pd.dropna(subset=["text"]).iloc[0]
    toks = doc["text"].lower().split(" ")
    n_oov = sum(1 for t in toks if t not in vocab)
    row = out[out.doc_id == doc["doc_id"]].iloc[0]
    assert row["n_tokens"] == len(toks) and row["n_oov"] == n_oov


def test_bigram_lm_probabilities_consistent(spark):
    out = REGISTRY["q99_bigram_lm"].spark_fn(spark, SMOKE_SF_DIR).toPandas()
    assert out["cond_p"].between(0, 1).all()
    assert (out["cnt"] <= out["w1_total"]).all()
    # P(w2|w1) summed over the observed w2 for a fixed w1 never exceeds 1
    assert (out.groupby("w1")["cond_p"].sum() <= 1.0 + 1e-12).all()


def test_debounce_matches_pandas_recount(spark, events_pd):
    out = REGISTRY["q100_event_debounce"].spark_fn(spark, SMOKE_SF_DIR).toPandas()
    kept = set()
    for _, g in events_pd.sort_values(["ts", "event_id"]).groupby("user_id"):
        prev = None
        for _, r in g.iterrows():
            if prev is None or (r["ts"] - prev).total_seconds() > 600:
                kept.add(r["event_id"])
            prev = r["ts"]  # lag-form: gap measured to the previous RAW event
    assert set(out["event_id"]) == kept


def test_hard_negatives_cross_label_and_top(spark):
    emb = pd.read_parquet(f"{SMOKE_SF_DIR}/embeddings.parquet")
    out = (
        REGISTRY["q101_hard_negative_mining"].spark_fn(spark, SMOKE_SF_DIR).toPandas()
    )
    assert (out["label"] != out["neighbor_label"]).all()
    assert set(out.groupby("query_id")["rank"].max()) == {5}
    # numpy recount of the rank-1 hard negative for query 0
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].to_numpy()
    q = 0
    cos = (M @ M[q]) / (np.linalg.norm(M, axis=1) * np.linalg.norm(M[q]))
    mask = labels != labels[q]
    best = emb["vec_id"].to_numpy()[mask][np.argmax(cos[mask])]
    got = out[(out.query_id == q) & (out["rank"] == 1)].iloc[0]["neighbor_id"]
    assert got == best


def test_embedding_standardize_matches_numpy(spark):
    emb = pd.read_parquet(f"{SMOKE_SF_DIR}/embeddings.parquet")
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    X = np.floor(M * 1_000_000).astype(np.int64)
    out = (
        REGISTRY["q103_embedding_standardize"]
        .spark_fn(spark, SMOKE_SF_DIR)
        .toPandas()
        .set_index("pos")
        .sort_index()
    )
    assert list(out.index) == list(range(1, M.shape[1] + 1))
    assert (out["n"] == len(M)).all()
    assert (out["s1"].to_numpy() == X.sum(axis=0)).all()
    # s2 is a DECIMAL(38,0) rendered as string (round-7 overflow fix)
    assert (
        out["s2"].map(int).to_numpy() == (X.astype(object) ** 2).sum(axis=0)
    ).all()
    np.testing.assert_allclose(
        out["mean_micros"].to_numpy(), X.mean(axis=0), rtol=1e-12
    )
    np.testing.assert_allclose(
        out["std_micros"].to_numpy(), X.std(axis=0), rtol=1e-9
    )


def test_gap_fill_grid_contiguous_and_sums(spark, events_pd):
    out = REGISTRY["q104_event_gap_fill"].spark_fn(spark, SMOKE_SF_DIR).toPandas()
    assert out["n"].sum() == len(events_pd)  # zero-fill adds no events
    for uid, g in out.groupby("user_id"):
        hours = g["hour_start"].sort_values().reset_index(drop=True)
        # contiguous hourly grid from first to last active hour
        assert (hours.diff().dropna() == pd.Timedelta(hours=1)).all()
        raw = events_pd[events_pd.user_id == uid]["ts"].dt.floor("h")
        assert hours.iloc[0] == raw.min() and hours.iloc[-1] == raw.max()
    assert (out["n"] >= 0).all() and (out["n"] == 0).any()  # gaps exist
