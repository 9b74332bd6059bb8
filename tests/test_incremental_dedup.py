"""Incremental dedup (q80 / dedup_increment_status) invariants:

- the exact tier composes: processing the corpus as two ordered
  increments gives every doc the same exact-dup decision as one batch
  (keep-first-arrival == keep-min-doc_id when increments arrive in id
  order) — the property that makes daily increments trustworthy;
- near flags are sound: every flagged doc really shares an (uncapped)
  band signature with an index doc, and every unflagged survivor shares
  none that survived the cap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
    LSH_MAX_BUCKET,
    dedup_increment_status,
    minhash_band_rows,
)
from retail_sales_etl_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _statuses(df):
    return {r["doc_id"]: r["status"] for r in df.collect()}


def test_exact_tier_two_increments_equal_one_batch(spark):
    docs = load_table(spark, SF, "documents")
    empty = docs.filter(F.lit(False))
    cut = 250

    # one batch against an empty index: exact tier only (no index bands)
    batch = _statuses(dedup_increment_status(empty, docs))

    # two ordered increments: A first, then B against accepted(A)
    a = docs.filter(F.col("doc_id") < cut)
    b = docs.filter(F.col("doc_id") >= cut)
    st_a = _statuses(dedup_increment_status(empty, a))
    a_accepted = a.join(
        spark.createDataFrame(
            [(i,) for i, s in st_a.items() if s == "accepted"], "doc_id long"
        ),
        "doc_id",
        "left_semi",
    )
    st_b = _statuses(dedup_increment_status(a_accepted, b))

    incremental = {**st_a, **st_b}
    assert set(incremental) == set(batch)
    # exact-tier equivalence: the same docs are exact_dups either way.
    # (step 2 can additionally near-flag against accepted(A)'s bands —
    # that's the incremental near tier working, not a divergence, so the
    # comparison collapses near_flagged/accepted to "not an exact dup".)
    for doc_id, s in batch.items():
        assert (incremental[doc_id] == "exact_dup") == (s == "exact_dup"), doc_id

    # and the batch exact tier equals q20's keep-min-id semantics
    keepers = {
        r["keep_id"]
        for r in docs.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.min("doc_id").alias("keep_id"))
        .collect()
    }
    for doc_id, s in batch.items():
        assert (s == "accepted") == (doc_id in keepers), doc_id


def test_near_flags_sound_and_complete_vs_bands(spark):
    docs = load_table(spark, SF, "documents")
    idx = docs.filter(F.col("doc_id") % 2 == 0)
    inc = docs.filter(F.col("doc_id") % 2 == 1)
    st = _statuses(dedup_increment_status(idx, inc))
    assert set(st.values()) <= {"accepted", "exact_dup", "near_flagged"}

    bands = minhash_band_rows(docs).collect()
    idx_buckets: dict = {}
    for r in bands:
        if r["doc_id"] % 2 == 0:
            idx_buckets.setdefault((r["band_idx"], r["sig"]), []).append(r["doc_id"])
    ok_keys = {k for k, v in idx_buckets.items() if len(v) <= LSH_MAX_BUCKET}
    inc_keys: dict = {}
    for r in bands:
        if r["doc_id"] % 2 == 1:
            inc_keys.setdefault(r["doc_id"], set()).add((r["band_idx"], r["sig"]))

    for doc_id, s in st.items():
        if s == "exact_dup":
            continue
        hits = inc_keys.get(doc_id, set()) & ok_keys
        assert (s == "near_flagged") == bool(hits), (doc_id, s)
