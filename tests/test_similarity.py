"""Similarity-search semantics tests: the Arrow/numpy brute-force path must
agree with the oracle-checked SQL-expression path, and RP-LSH must have
high recall on genuinely near-duplicate vectors (the sf testdata has only
weak similarities, so we plant real near-dups here)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.operators.similarity import (
    brute_force_topk_pandas,
)
from retail_sales_etl_pipeline_spark.plans.registry import load_all

from .conftest import SMOKE_SF_DIR

REGISTRY = load_all()


def test_pandas_topk_matches_sql_topk(spark):
    emb = spark.read.parquet(f"{SMOKE_SF_DIR}/embeddings.parquet")
    sql_res = REGISTRY["q30_ann_bruteforce"].spark_fn(spark, SMOKE_SF_DIR)
    pd_res = brute_force_topk_pandas(emb, query_ids=[0, 1, 2, 3, 4], k=10)

    sql_rows = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in sql_res.collect()
    }
    pd_rows = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in pd_res.collect()
    }
    assert set(sql_rows) == set(pd_rows)
    for key, (nid, cos) in sql_rows.items():
        pnid, pcos = pd_rows[key]
        assert pnid == nid, key
        # numpy matmul uses pairwise summation; agreement to ~1e-12 is the
        # expected envelope, exact equality is not.
        assert math.isclose(cos, pcos, abs_tol=1e-9), key


def _planted_vectors(spark, n=200, dims=32, n_dups=10, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((i, [rng.gauss(0, 1) for _ in range(dims)]))
    # plant near-dups: copy vector i with tiny jitter as id n+i
    dup_pairs = []
    for i in range(n_dups):
        base = rows[i][1]
        jitter = [x + rng.gauss(0, 0.01) for x in base]
        rows.append((n + i, jitter))
        dup_pairs.append((i, n + i))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        schema="vec_id LONG, embedding ARRAY<FLOAT>",
    )
    return df, dup_pairs


def test_rp_lsh_recall_on_planted_neardups(spark):
    from retail_sales_etl_pipeline_spark.operators.similarity import (
        RP_TABLES,
        rp_bucket_pair,
    )

    df, dup_pairs = _planted_vectors(spark)
    v = df.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb")
    )
    buckets = v.selectExpr(
        "vec_id",
        f"stack({RP_TABLES}, "
        + ", ".join(
            f"{t}, ({rp_bucket_pair('emb', t)[0]})" for t in range(RP_TABLES)
        )
        + ") AS (tbl, bucket)",
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("x"), F.col("b.vec_id").alias("y"))
        .distinct()
    )
    got = {(r["x"], r["y"]) for r in cand.collect()}
    hits = sum(1 for p in dup_pairs if p in got)
    # cosine ~0.999 pairs: per-table P(match) ~ (1-angle/pi)^bits ~ 0.95,
    # 4 tables -> recall ~1. Require >= 90%.
    assert hits >= len(dup_pairs) * 0.9, (hits, len(dup_pairs))


def test_rp_buckets_pandas_equals_sql_expression_path(spark):
    """The Arrow/numpy bucket twin (used by q32) must reproduce the pure-SQL
    rp_bucket_pair expressions exactly — same (vec_id, tbl, bucket) set —
    on the real embeddings table, so swapping paths can never shift the
    oracle-checked candidate set."""
    from retail_sales_etl_pipeline_spark.operators.similarity import (
        RP_TABLES,
        rp_bucket_pair,
        rp_buckets_pandas,
    )

    emb = spark.read.parquet(f"{SMOKE_SF_DIR}/embeddings.parquet")
    sql_buckets = (
        emb.select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
        )
        .selectExpr(
            "vec_id",
            f"stack({RP_TABLES}, "
            + ", ".join(
                f"{t}, ({rp_bucket_pair('emb', t)[0]})" for t in range(RP_TABLES)
            )
            + ") AS (tbl, bucket)",
        )
        .collect()
    )
    arrow_buckets = rp_buckets_pandas(emb).collect()
    sql_set = {(r["vec_id"], r["tbl"], r["bucket"]) for r in sql_buckets}
    arrow_set = {(r["vec_id"], r["tbl"], r["bucket"]) for r in arrow_buckets}
    assert len(arrow_buckets) == len(arrow_set)  # no dup emissions
    assert sql_set == arrow_set


def test_nprobe_recall_at_least_single_probe(spark):
    """Probing 2 clusters must recall at least as many true (brute-force)
    top-k neighbors as probing 1, for every query — the monotonicity that
    justifies nprobe as the recall/cost knob."""
    bf = {}
    for r in REGISTRY["q30_ann_bruteforce"].spark_fn(spark, SMOKE_SF_DIR).collect():
        bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(name):
        got = {}
        for r in REGISTRY[name].spark_fn(spark, SMOKE_SF_DIR).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return {q: len(got.get(q, set()) & bf[q]) for q in bf}

    r1 = recall("q31_ann_ivf")
    r2 = recall("q52_ann_ivf_nprobe")
    assert all(r2[q] >= r1[q] for q in bf), (r1, r2)
    assert sum(r2.values()) >= sum(r1.values())


def test_ivf_results_subset_of_bruteforce_universe(spark):
    """IVF returns valid (query, neighbor, cosine) triples whose cosines
    match the brute-force scores for the same pairs (approximation affects
    WHICH neighbors, never their scores)."""
    bf = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in REGISTRY["q30_ann_bruteforce"].spark_fn(spark, SMOKE_SF_DIR)
        .drop("rank")
        .collect()
    }
    ivf = REGISTRY["q31_ann_ivf"].spark_fn(spark, SMOKE_SF_DIR).collect()
    assert len(ivf) > 0
    for r in ivf:
        key = (r["query_id"], r["neighbor_id"])
        if key in bf:
            assert r["cosine"] == pytest.approx(bf[key], abs=0)


def test_quantized_probe_recall_vs_bruteforce(spark):
    """q62 (int8 probe -> fp64 re-rank of 3k candidates) must recover at
    least 90% of the exact brute-force top-10 per query. At this scale the
    quantized ranking is near-order-preserving, so recall is typically 1.0;
    0.9 guards the property without pinning ulp-level rank swaps."""
    from retail_sales_etl_pipeline_spark.plans.registry import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    exact = {}
    for r in reg["q30_ann_bruteforce"].spark_fn(spark, sf).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    quant = {}
    for r in reg["q62_ann_quantized"].spark_fn(spark, sf).collect():
        quant.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(quant) == set(exact)
    for qid, top in exact.items():
        recall = len(quant[qid] & top) / len(top)
        assert recall >= 0.9, (qid, recall)
