"""ExactSubstr family (q267-q270): brute-force recount, handcrafted
spans, twin identity, and the runs==coverage invariant.

The recount is deliberately INDEPENDENT of the plans' k-gram-run
identity: it enumerates duplicated substrings of EVERY length
l in [L, max doc length] and unions their covered positions — verifying
both the implementation and the identity itself (any position covered by
a duplicated substring of length >= L must equal the L-gram-window
union) on the real corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans.exactsubstr_queries import (
    ESUB_L,
    q267_exactsubstr_coverage,
    q268_exactsubstr_runs,
    q269_exactsubstr_hashed_coverage,
    q270_exactsubstr_freq_report,
)

from .conftest import SMOKE_SF_DIR


def _corpus(spark):
    return {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(
            f"{SMOKE_SF_DIR}/documents.parquet"
        ).select("doc_id", "text").collect()
    }


def _brute_coverage(toks_by_doc: dict, min_len: int) -> dict:
    """All-lengths duplicated-substring coverage, pure Python: for each
    l >= min_len, count every l-gram across the corpus; positions inside
    any occurrence of an l-gram with total count >= 2 are covered."""
    max_len = max((len(t) for t in toks_by_doc.values()), default=0)
    covered = {d: set() for d in toks_by_doc}
    for ln in range(min_len, max_len + 1):
        counts: dict = {}
        occs = []
        for d, toks in toks_by_doc.items():
            for i in range(len(toks) - ln + 1):
                g = tuple(toks[i : i + ln])
                counts[g] = counts.get(g, 0) + 1
                occs.append((d, i, g))
        for d, i, g in occs:
            if counts[g] >= 2:
                covered[d].update(range(i, i + ln))
    return {
        d: len(c)
        for d, c in covered.items()
        if len(toks_by_doc[d]) >= min_len
    }


def test_brute_force_recount_all_lengths(spark):
    toks = _corpus(spark)
    want = _brute_coverage(toks, ESUB_L)
    got = {
        r.doc_id: r.dup_tokens
        for r in q267_exactsubstr_coverage(spark, SMOKE_SF_DIR).collect()
    }
    assert got == want
    # the corpus genuinely exercises the operator: some docs covered,
    # some not, at least one partially covered
    assert any(v > 0 for v in got.values())
    assert any(v == 0 for v in got.values())


@pytest.fixture(scope="module")
def toy_sf_dir(spark, tmp_path_factory):
    """Handcrafted spans: docs 1/2 share a 10-token run, doc 3 repeats
    its own 8-token boilerplate twice (disjoint), doc 4 is dup-free,
    doc 5 shares only a 7-token (< L) run with doc 4 — must NOT count."""
    d = tmp_path_factory.mktemp("esub_toy")
    u = [f"u{i}" for i in range(40)]  # unique filler tokens
    shared = [f"s{i}" for i in range(10)]
    boiler = [f"b{i}" for i in range(8)]
    seven = [f"v{i}" for i in range(7)]
    docs = [
        (1, " ".join(shared + u[:6])),                    # run at pos 1-10
        (2, " ".join(u[6:12] + shared)),                  # run at pos 7-16
        (3, " ".join(boiler + u[12:17] + boiler)),        # self-dup, 2 runs
        (4, " ".join(u[17:25] + seven)),                  # 7 < L: clean
        (5, " ".join(seven + u[25:34])),                  # 7 < L: clean
    ]
    spark.createDataFrame(
        [(i, t, "en", "toy", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_toy_coverage_exact_values(spark, toy_sf_dir):
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_ppm)
        for r in q267_exactsubstr_coverage(spark, toy_sf_dir).collect()
    }
    assert got == {
        1: (16, 10, 625000),          # shared 10-token span
        2: (16, 10, 625000),
        3: (21, 16, 761904),          # two disjoint 8-token boilerplates
        4: (15, 0, 0),                # 7-token share is below L
        5: (16, 0, 0),
    }


def test_toy_runs_spans(spark, toy_sf_dir):
    runs = {
        (r.doc_id, r.run_start): (r.run_len, r.n_grams)
        for r in q268_exactsubstr_runs(spark, toy_sf_dir).collect()
    }
    # 10-token shared span = 3 overlapping dup 8-grams merged into one run
    assert runs == {
        (1, 1): (10, 3),
        (2, 7): (10, 3),
        (3, 1): (8, 1),
        (3, 14): (8, 1),
    }


def test_hashed_twin_identity(spark):
    exact = sorted(
        tuple(r) for r in q267_exactsubstr_coverage(spark, SMOKE_SF_DIR).collect()
    )
    hashed = sorted(
        tuple(r)
        for r in q269_exactsubstr_hashed_coverage(spark, SMOKE_SF_DIR).collect()
    )
    assert exact == hashed


def test_runs_sum_equals_coverage(spark):
    cov = {
        r.doc_id: r.dup_tokens
        for r in q267_exactsubstr_coverage(spark, SMOKE_SF_DIR).collect()
        if r.dup_tokens > 0
    }
    run_sum = {
        r.doc_id: r.total
        for r in q268_exactsubstr_runs(spark, SMOKE_SF_DIR)
        .groupBy("doc_id")
        .agg(F.sum("run_len").alias("total"))
        .collect()
    }
    assert run_sum == cov


def test_freq_report_accounts_every_gram(spark):
    toks = _corpus(spark)
    n_grams_total = sum(
        len(t) - ESUB_L + 1 for t in toks.values() if len(t) >= ESUB_L
    )
    rows = q270_exactsubstr_freq_report(spark, SMOKE_SF_DIR).collect()
    assert sum(r.n_occurrences for r in rows) == n_grams_total
    assert all(r.freq_bucket >= 1 for r in rows)
