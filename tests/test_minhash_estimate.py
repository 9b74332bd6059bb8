"""Value-level checks for the q84/q85/q86 dedup rungs.

The hash parity of each query is proven by the DuckDB oracle
(tests/test_parity_queries.py); these tests pin the SEMANTIC claims the
docstrings make:

- q86: the Broder estimator tracks ground-truth Jaccard where it matters
  (high-resemblance pairs), correlates strongly overall, and exhibits the
  KNOWN conditioning bias at low resemblance — banded candidates agree on
  >= 1 band by construction, so over candidates the estimate floors near
  rows_per_band/n_perms instead of 0. That bias is why the pipeline
  verifies candidates (q21) instead of trusting the estimate at low j.
- q84: the pigeonhole guarantee — any fingerprint pair within the hamming
  threshold shares at least one block — checked as pure math over every
  fingerprint pair, plus the query's flagged set reproduced exactly by a
  brute-force model that mirrors the hot-bucket cap.
- q85: duplicated-passage coverage cross-checked row-for-row in pure
  Python.
"""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
    PASSAGE_N,
    SIMHAM_BAND_BITS,
    SIMHAM_BANDS,
    SIMHAM_BITS,
    SIMHAM_MAX_BUCKET,
    SIMHAM_MAX_HAMMING,
    q84_simhash_hamming_pairs,
    q85_passage_duplication,
    q86_minhash_jaccard_estimate,
)

SF = "/root/testdata/sf0.001"


def test_minhash_estimator_tracks_exact_jaccard(spark):
    rows = q86_minhash_jaccard_estimate(spark, SF).collect()
    assert rows, "candidate pairs must exist at sf0.001"
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        # 16 permutations -> estimate is a multiple of 1/16
        assert abs(r.est_jaccard * 16 - round(r.est_jaccard * 16)) < 1e-12
        # identical docs (resemblance 1) must estimate exactly 1
        if r.jaccard == 1.0:
            assert r.est_jaccard == 1.0

    # strong overall correlation (observed ~0.95 at sf0.001)
    n = len(rows)
    se = sum(r.est_jaccard for r in rows)
    sj = sum(r.jaccard for r in rows)
    see = sum(r.est_jaccard**2 for r in rows)
    sjj = sum(r.jaccard**2 for r in rows)
    sej = sum(r.est_jaccard * r.jaccard for r in rows)
    corr = (n * sej - se * sj) / (
        ((n * see - se**2) ** 0.5) * ((n * sjj - sj**2) ** 0.5)
    )
    assert corr >= 0.8, f"estimator/truth correlation {corr:.3f} too weak"

    # where the estimate is trusted (high resemblance) it is accurate
    high = [r for r in rows if r.jaccard >= 0.6]
    assert high, "testdata should contain true near-dup candidate pairs"
    assert all(r.est_jaccard >= 0.5 for r in high)
    mae_high = sum(abs(r.est_jaccard - r.jaccard) for r in high) / len(high)
    assert mae_high <= 0.15, f"high-resemblance MAE {mae_high:.3f}"


def test_simhash_pigeonhole_and_capped_candidate_model(spark):
    """Pure-math pigeonhole over ALL fingerprint pairs, then reproduce the
    query's flagged near-dup set exactly with a brute-force model that
    mirrors the hot-bucket cap (this corpus clusters in simhash space —
    some block buckets exceed the cap and are dropped, observably)."""
    from retail_sales_etl_pipeline_spark.operators.text import simhash_pandas
    from retail_sales_etl_pipeline_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    sims = {
        r.doc_id: r.simhash
        for r in simhash_pandas(docs, bits=SIMHAM_BITS).collect()
    }
    mod = 1 << SIMHAM_BAND_BITS

    def blocks(s):
        return tuple((s >> (SIMHAM_BAND_BITS * i)) % mod for i in range(SIMHAM_BANDS))

    bucket_sizes: Counter = Counter()
    for s in sims.values():
        for i, b in enumerate(blocks(s)):
            bucket_sizes[(i, b)] += 1

    expected_flagged = set()
    for (da, sa), (db, sb) in combinations(sorted(sims.items()), 2):
        ham = bin(sa ^ sb).count("1")
        shared = [
            i
            for i, (x, y) in enumerate(zip(blocks(sa), blocks(sb)))
            if x == y
        ]
        if ham <= SIMHAM_MAX_HAMMING:
            # the mathematical guarantee: <= SIMHAM_MAX_HAMMING flips
            # cannot touch all SIMHAM_BANDS blocks
            assert shared, f"pair ({da},{db}) hamming {ham} shares no block"
            # capped model: the pair is a candidate iff some shared block
            # bucket is within the cap
            if any(
                bucket_sizes[(i, blocks(sa)[i])] <= SIMHAM_MAX_BUCKET
                for i in shared
            ):
                expected_flagged.add((da, db))

    flagged = {
        (r.doc_a, r.doc_b)
        for r in q84_simhash_hamming_pairs(spark, SF).filter("is_neardup").collect()
    }
    assert flagged == expected_flagged
    assert expected_flagged, "testdata should contain simhash near-dups"


def test_passage_duplication_matches_python(spark):
    from retail_sales_etl_pipeline_spark.sources import load_table

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents").collect()
    }

    def passages(t):
        toks = t.split(" ")
        return {
            " ".join(toks[i : i + PASSAGE_N])
            for i in range(len(toks) - PASSAGE_N + 1)
        }

    freq: dict[str, int] = {}
    per_doc = {}
    for did, t in texts.items():
        ps = passages(t)
        if not ps:
            continue
        per_doc[did] = ps
        for g in ps:
            freq[g] = freq.get(g, 0) + 1

    got = {r.doc_id: r for r in q85_passage_duplication(spark, SF).collect()}
    assert set(got) == set(per_doc)
    n_with_shared = 0
    for did, ps in per_doc.items():
        n_shared = sum(1 for g in ps if freq[g] >= 2)
        n_with_shared += bool(n_shared)
        r = got[did]
        assert r.n_passages == len(ps)
        assert r.n_shared_passages == n_shared
        assert r.dup_coverage == pytest.approx(n_shared / len(ps), abs=0)
    assert n_with_shared, "testdata should contain cross-doc shared passages"
