"""q82 (approx profile) accuracy contract vs q78 (exact rank statistics):
counts/min/max/totals identical; approximate quantiles within the
Greenwald-Khanna rank tolerance of the exact values — the documented
exact-vs-mergeable trade, verified rather than assumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans.registry import load_all
from retail_sales_etl_pipeline_spark.sources import load_table

from .conftest import SMOKE_SF_DIR

REGISTRY = load_all()


def test_approx_profile_matches_exact_within_rank_tolerance(spark):
    exact = {
        r["source"]: r
        for r in REGISTRY["q78_source_length_profile"].spark_fn(spark, SMOKE_SF_DIR).collect()
    }
    approx = {
        r["source"]: r
        for r in REGISTRY["q82_source_length_profile_approx"].spark_fn(spark, SMOKE_SF_DIR).collect()
    }
    assert set(exact) == set(approx)

    lengths = {}
    docs = load_table(spark, SMOKE_SF_DIR, "documents").select(
        "source", F.size(F.split("text", " ")).alias("n")
    )
    for r in docs.collect():
        lengths.setdefault(r["source"], []).append(r["n"])

    for src, ex in exact.items():
        ap = approx[src]
        for col in ("n", "min_tokens", "max_tokens", "total_tokens"):
            assert ap[col] == ex[col], (src, col)
        vals = sorted(lengths[src])
        n = len(vals)
        # GK accuracy 1/10000: rank error < 1 at this scale, but any value
        # BETWEEN the neighboring exact order stats is within contract
        for col, q in (("median_tokens", 0.5), ("p95_tokens", 0.95)):
            lo = vals[max(0, int(q * n) - 1)]
            hi = vals[min(n - 1, int(q * n) + 1)]
            assert lo <= ap[col] <= hi, (src, col, ap[col], lo, hi)
        # measured envelope (q82 doc, round 12): below 10K docs/source
        # the GK rank error floors to 0, so the sketch must return
        # EXACTLY q78's order statistic — zero delta, not merely close
        if n < 10000:
            assert ap["median_tokens"] == ex["median_tokens"], src
            assert ap["p95_tokens"] == ex["p95_tokens"], src
