"""Bloom pre-filter semantics: survivor set must equal the plain exact
anti-join even when the filter is undersized (forcing false positives),
and the broadcast-bitmap physical form must make identical decisions to
the positions-set join form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.operators.bloom import (
    BLOOM_M,
    bloom_bitmap_build,
    bloom_bitmap_filter,
    bloom_bits,
    bloom_prefilter_new,
)


@pytest.fixture(scope="module")
def keys(spark):
    # 400 corpus keys, 400-key batch overlapping in 100 keys
    corpus = spark.range(0, 400).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2654435761 % 1000003).alias("key_hash")
    )
    batch = spark.range(300, 700).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2654435761 % 1000003).alias("key_hash")
    )
    return corpus, batch


def _exact_new(batch, corpus):
    return {
        r["doc_id"]
        for r in batch.join(
            corpus.select("key_hash").distinct(), "key_hash", "left_anti"
        ).collect()
    }


@pytest.mark.parametrize("m", [BLOOM_M, 64])  # 64 bits => rampant false positives
def test_prefilter_equals_exact_antijoin(spark, keys, m):
    corpus, batch = keys
    res = bloom_prefilter_new(batch, corpus, m=m).collect()
    got = {r["doc_id"] for r in res}
    assert got == _exact_new(batch, corpus)
    if m == 64:
        # the tiny filter must have pushed some rows through exact verify
        assert any(r["bloom_candidate"] for r in res)
    else:
        # well-sized filter: overlap keys are candidates (then eliminated),
        # fresh keys overwhelmingly skip verification
        n_cand = sum(r["bloom_candidate"] for r in res)
        assert n_cand <= len(res) * 0.1


@pytest.mark.parametrize("m", [BLOOM_M, 64])
def test_bitmap_form_matches_join_form(spark, keys, m):
    corpus, batch = keys
    bitmap = bloom_bitmap_build(corpus, m=m)
    bm_cand = {r["doc_id"] for r in bloom_bitmap_filter(batch, bitmap, m=m).collect()}
    bm_new = {
        r["doc_id"]
        for r in bloom_bitmap_filter(batch, bitmap, m=m, candidates=False).collect()
    }
    # join-form definite-new = rows with a missing position
    pos_join_new = {
        r["doc_id"]
        for r in bloom_prefilter_new(batch, corpus, m=m).collect()
        if not r["bloom_candidate"]
    }
    assert bm_new == pos_join_new
    assert bm_cand == {r["doc_id"] for r in batch.collect()} - bm_new


def test_bits_relation_is_bounded(spark, keys):
    corpus, _ = keys
    n_bits = bloom_bits(corpus).count()
    assert n_bits <= 400 * 4  # |corpus| * K distinct positions at most
    assert n_bits > 0


def test_prefilter_property_random_key_sets(spark):
    """Hypothesis-style sweep without a JVM per example: many random
    (corpus, batch, m) triples in one pass — survivors must equal the
    exact anti-join for EVERY combination, including empty corpus, full
    overlap, and a degenerate 8-bit filter."""
    import random

    rng = random.Random(20260813)
    for trial in range(8):
        m = rng.choice([8, 64, 1021, BLOOM_M])
        corpus_keys = rng.sample(range(10_000), rng.randint(0, 40))
        batch_keys = rng.sample(range(10_000), rng.randint(1, 60))
        if trial == 6:
            batch_keys = corpus_keys or [1]  # full overlap
        corpus = spark.createDataFrame(
            [(i, k) for i, k in enumerate(corpus_keys)] or [(0, -999)],
            "doc_id long, key_hash long",
        )
        if not corpus_keys:
            corpus = corpus.filter("doc_id < 0")  # truly empty relation
        batch = spark.createDataFrame(
            [(i, k) for i, k in enumerate(batch_keys)],
            "doc_id long, key_hash long",
        )
        got = {
            r["key_hash"]
            for r in bloom_prefilter_new(batch, corpus, m=m).collect()
        }
        expect = set(batch_keys) - set(corpus_keys)
        assert got == expect, (trial, m, sorted(got), sorted(expect))
