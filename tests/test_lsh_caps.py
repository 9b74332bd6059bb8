"""Hot-bucket cap property tests: adversarial corpora where LSH candidate
generation would go quadratic without the cap.

The attack shape (and why the cap exists): N near-identical documents
share every MinHash band, forming one bucket of size N whose self-join
emits N*(N-1)/2 pairs — O(N^2) in exactly the corpora (boilerplate, empty
docs) where near-dedup matters most. With a cap c, any bucket larger than
c is dropped before pairing, bounding pair work at n_buckets * c^2, and
the drop is observable (no silent caps).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
    LSH_MAX_BUCKET,
    minhash_band_rows,
    minhash_candidates,
)
from retail_sales_etl_pipeline_spark.plans.similarity_queries import rp_neardup_pairs

N_CLONES = 80  # > LSH_MAX_BUCKET, so the degenerate bucket trips the cap


@pytest.fixture(scope="module")
def adversarial_docs(spark):
    """N_CLONES byte-identical docs + a handful of genuinely similar and
    distinct ones."""
    clones = [(i, "the same boilerplate footer text repeated everywhere") for i in range(N_CLONES)]
    near = [
        (1000, "alpha beta gamma delta epsilon zeta eta theta"),
        (1001, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    distinct = [
        (2000, "completely different content about spark partitions"),
        (2001, "unrelated verse regarding adaptive query execution"),
    ]
    return spark.createDataFrame(clones + near + distinct, "doc_id long, text string")


def test_cap_bounds_candidates_on_degenerate_corpus(adversarial_docs):
    # Uncapped (cap >= N_CLONES): the clone bucket alone yields all-pairs.
    uncapped = minhash_candidates(adversarial_docs, max_bucket=10_000).count()
    assert uncapped >= N_CLONES * (N_CLONES - 1) // 2  # quadratic blow-up is real

    # Capped at the default: the clone buckets (size N_CLONES > cap) are
    # dropped entirely; surviving pair count is bounded by what the small
    # buckets can produce — nowhere near quadratic in N_CLONES.
    capped = minhash_candidates(adversarial_docs, max_bucket=LSH_MAX_BUCKET)
    rows = capped.collect()
    assert len(rows) < N_CLONES  # O(N*cap) bound, not O(N^2)
    ids = {r["doc_a"] for r in rows} | {r["doc_b"] for r in rows}
    assert not any(i < N_CLONES for i in ids)  # no clone survived into pairing
    # the genuinely-similar small-bucket pair is still found
    assert any(r["doc_a"] == 1000 and r["doc_b"] == 1001 for r in rows)


def test_cap_is_noop_when_no_bucket_exceeds_it(adversarial_docs):
    small = adversarial_docs.filter(F.col("doc_id") >= 1000)
    a = {tuple(r) for r in minhash_candidates(small, max_bucket=LSH_MAX_BUCKET).collect()}
    b = {tuple(r) for r in minhash_candidates(small, max_bucket=10_000).collect()}
    assert a == b


def test_dropped_buckets_are_observable(adversarial_docs):
    """No silent caps: the exact clone bucket shows up as droppable."""
    sizes = (
        minhash_band_rows(adversarial_docs)
        .groupBy("band_idx", "sig")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    over = sizes.filter(F.col("n") > LSH_MAX_BUCKET).collect()
    # all 4 bands of the clone signature are over-full, each with exactly
    # the clone population
    assert len(over) == 4
    assert all(r["n"] == N_CLONES for r in over)


def test_rp_cap_bounds_candidates_on_degenerate_embeddings(spark):
    # Identical embeddings all land in the same (tbl, bucket) cell of every
    # table. 40 clones with cap 16 must produce zero clone pairs; two
    # distinct-but-close vectors in small buckets still pair up.
    dims = 64
    clone = [0.5] * dims
    near_a = [1.0] + [0.01] * (dims - 1)
    near_b = [0.99] + [0.012] * (dims - 1)
    rows = [(i, clone) for i in range(40)] + [(100, near_a), (101, near_b)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    uncapped = rp_neardup_pairs(emb, max_bucket=10_000, min_cos=0.9).count()
    assert uncapped >= 40 * 39 // 2

    capped = rp_neardup_pairs(emb, max_bucket=16, min_cos=0.9).collect()
    ids = {r["vec_a"] for r in capped} | {r["vec_b"] for r in capped}
    assert not any(i < 40 for i in ids)
    assert any(r["vec_a"] == 100 and r["vec_b"] == 101 for r in capped)
