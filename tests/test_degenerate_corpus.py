"""Degenerate-data stress: a corpus where EVERY document is identical and
every embedding is identical — the worst case for any pair-generating
operator, and the 100 TB skew scenario the hot-bucket / cluster caps
exist for. The contract proven here: nothing explodes, caps bite
deterministically, and the exactness backstops still give the right
answer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans import mixing_queries as mq
from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
    LSH_MAX_BUCKET,
    minhash_candidates,
)
from retail_sales_etl_pipeline_spark.plans.registry import load_all
from retail_sales_etl_pipeline_spark.sources import TABLE_NAMES, load_table

from .conftest import SMOKE_SF_DIR

REGISTRY = load_all()
N_DOCS = 400  # > LSH_MAX_BUCKET and > SEM_MAX_CLUSTER


@pytest.fixture(scope="module")
def degenerate_sf_dir(spark, tmp_path_factory):
    """All tables real except documents/embeddings, which collapse to one
    repeated text and one repeated vector (distinct ids)."""
    d = tmp_path_factory.mktemp("degenerate_sf")
    for t in TABLE_NAMES:
        if t in ("documents", "embeddings"):
            continue
        load_table(spark, SMOKE_SF_DIR, t).write.parquet(str(d / f"{t}.parquet"))
    one_doc = load_table(spark, SMOKE_SF_DIR, "documents").limit(1).collect()[0]
    spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.lit(one_doc["source"]).alias("source"),
        F.lit(one_doc["lang"]).alias("lang"),
        F.lit(one_doc["text"]).alias("text"),
    ).write.parquet(str(d / "documents.parquet"))
    one_vec = load_table(spark, SMOKE_SF_DIR, "embeddings").limit(1).collect()[0]
    spark.range(N_DOCS).select(
        F.col("id").alias("vec_id"),
        F.lit(one_vec["embedding"]).alias("embedding"),
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_exact_dedup_still_exact(spark, degenerate_sf_dir):
    rows = REGISTRY["q20_dedup_exact"].spark_fn(spark, degenerate_sf_dir).collect()
    assert len(rows) == 1
    assert rows[0]["keep_id"] == 0
    assert rows[0]["n_copies"] == N_DOCS


def test_lsh_cap_prevents_quadratic_candidates(spark, degenerate_sf_dir):
    """400 identical docs share every band signature: uncapped, that is
    ~80k pairs per band. The hot-bucket cap must drop those buckets
    entirely (FineWeb convention) — zero candidates, and q59's report
    makes the drop observable rather than silent."""
    docs = load_table(spark, degenerate_sf_dir, "documents")
    cand = minhash_candidates(docs)
    assert cand.count() == 0

    mh_rows = [
        r
        for r in REGISTRY["q59_lsh_bucket_stats"]
        .spark_fn(spark, degenerate_sf_dir)
        .collect()
        if r["space"] == "minhash"
    ]
    assert mh_rows  # every MinHash band reports
    for r in mh_rows:
        assert r["max_bucket_n"] == N_DOCS
        assert r["n_buckets_dropped"] >= 1  # the cap visibly bit
        assert r["rows_dropped"] == N_DOCS


def test_semdedup_cap_bounds_pairs_and_still_dedups(spark, degenerate_sf_dir):
    """All 400 identical embeddings land in one cluster; pairing is capped
    at SEM_MAX_CLUSTER members, so pair work is bounded — and because the
    kept member set includes vec_id 0 (ranked by id), every capped member
    except the minimum is still correctly dropped."""
    rows = {
        r["vec_id"]: r
        for r in REGISTRY["q74_semantic_neardup"]
        .spark_fn(spark, degenerate_sf_dir)
        .collect()
    }
    assert len(rows) == N_DOCS
    assert len({r["centroid_id"] for r in rows.values()}) == 1
    kept = {i for i, r in rows.items() if r["kept"]}
    # members within the pairing cap: only the minimum id survives
    assert {i for i in kept if i < mq.SEM_MAX_CLUSTER} == {0}
    # members beyond the cap are unpaired -> kept (the documented,
    # observable trade; at scale k grows so clusters stay under the cap)
    assert {i for i in kept if i >= mq.SEM_MAX_CLUSTER} == set(
        range(mq.SEM_MAX_CLUSTER, N_DOCS)
    )


def test_curation_survives_degenerate_corpus(spark, degenerate_sf_dir):
    """The full curation composition on an all-duplicates corpus: exact
    dedup collapses everything to one survivor, nothing times out or
    explodes downstream of the capped candidate stage."""
    out = REGISTRY["q29_corpus_curation"].spark_fn(spark, degenerate_sf_dir).collect()
    assert len(out) == 1
    assert out[0]["doc_id"] == 0


def test_novelty_all_zero_and_bounded_on_identical_corpus(spark, degenerate_sf_dir):
    """q121 on 400 identical docs: every shingle's df is 400, so novelty
    is zero everywhere — and the per-shingle doc list (the fold the
    single-pass form carries) stays shingles-per-doc x N, completing
    without incident."""
    out = (
        REGISTRY["q121_ngram_novelty"]
        .spark_fn(spark, degenerate_sf_dir)
        .collect()
    )
    assert len(out) == N_DOCS
    assert all(r.n_novel == 0 and r.novelty_ppm == 0 for r in out)


def test_sparse_similarity_df_cap_kills_degenerate_postings(spark, degenerate_sf_dir):
    """q127 on identical docs: every term's df (400) exceeds the cap, so
    the posting self-join generates ZERO pairs — the cap turning a
    would-be 80k-pair quadratic into an empty result, loudly visible."""
    out = (
        REGISTRY["q127_sparse_tfidf_similarity"]
        .spark_fn(spark, degenerate_sf_dir)
        .collect()
    )
    assert out == []


def test_component_split_survives_identical_corpus(spark, degenerate_sf_dir):
    """q153 on identical docs: the capped candidate graph still yields a
    valid clustering (CC converges) and every component maps to exactly
    one split."""
    rows = (
        REGISTRY["q153_component_keyed_split"]
        .spark_fn(spark, degenerate_sf_dir)
        .collect()
    )
    assert len(rows) == N_DOCS
    comp_splits = {}
    for r in rows:
        comp_splits.setdefault(r.component_id, set()).add(r.split)
    assert all(len(s) == 1 for s in comp_splits.values())


def test_dsir_survives_single_source_corpus(spark, degenerate_sf_dir):
    """q158 on a corpus collapsed to ONE source: either every doc is
    target (no candidates -> empty result) or every doc is a candidate
    with an identical bag (equal weights, doc_id tiebreak) — both sides
    bounded, no explosion, ranks dense."""
    rows = (
        REGISTRY["q158_dsir_importance_weights"]
        .spark_fn(spark, degenerate_sf_dir)
        .collect()
    )
    assert len(rows) <= mq.DSIR_K
    if rows:
        assert len({r.logw_micronat for r in rows}) == 1  # identical docs
        assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
        assert [r.doc_id for r in sorted(rows, key=lambda r: r.rnk)] == sorted(
            r.doc_id for r in rows
        )


def test_overlap_sketch_single_source_is_empty(spark, degenerate_sf_dir):
    """q161 with one source has no pairs — empty, not an error."""
    out = (
        REGISTRY["q161_source_overlap_sketch"]
        .spark_fn(spark, degenerate_sf_dir)
        .collect()
    )
    assert out == []
