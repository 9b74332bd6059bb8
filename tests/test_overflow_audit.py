"""Mechanical int64-overflow audit (tools/audit_overflow.py).

Four rounds of late-caught ANSI overflows (q118, q198, q203, q214 — each
with prose that "proved" safety while missing one term) ended with the
round-6 bench crashing on q214's SUM(y*y). The audit replaces prose with
a plan walk: every sum over an unpromoted integer product must carry a
written bound in tools/overflow_allowlist.json, and the walk itself must
catch a seeded regression (the q214 pattern) — both pinned here.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.audit_overflow import (  # noqa: E402
    ALLOWLIST_PATH,
    normalize,
    sum_product_sites,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_seeded_q214_regression_is_flagged(spark):
    """The exact pattern that killed the round-6 bench — SUM over a raw
    long*long product — must be flagged by the walker."""
    df = (
        spark.range(100)
        .select((F.col("id") * 100000).alias("y"))
        .agg(F.sum(F.col("y") * F.col("y")).alias("syy"))
    )
    sites = sum_product_sites(_plan(df))
    assert any("y * y" in s for s in sites), sites


def test_decimal_promoted_sum_not_flagged(spark):
    """The fix shape — per-operand DECIMAL(19,0) casts inside the SUM —
    must NOT be flagged (the product runs in decimal, good to 1e38)."""
    df = (
        spark.range(100)
        .select((F.col("id") * 100000).alias("y"))
        .agg(
            F.sum(
                F.col("y").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)")
            ).alias("syy")
        )
    )
    assert sum_product_sites(_plan(df)) == []


def test_double_sum_not_flagged(spark):
    """IEEE accumulation is not the int64-overflow class."""
    df = (
        spark.range(100)
        .select(F.col("id").cast("double").alias("y"))
        .agg(F.sum(F.col("y") * F.col("y")).alias("syy"))
    )
    assert sum_product_sites(_plan(df)) == []


def test_windowed_sum_product_flagged(spark):
    """The walker sees window sums too, not just aggregates."""
    from pyspark.sql import Window

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    out = df.select(F.sum(F.col("v") * F.col("v")).over(w).alias("cum"))
    sites = sum_product_sites(_plan(out))
    assert any("v * v" in s for s in sites), sites


def test_mixed_marker_sum_still_flagged(spark):
    """r7-advisory regression: a decimal marker in ONE subexpression must
    not suppress the flag on a sibling unpromoted long*long product —
    sum(y*y + cast(cast(y as decimal) as long)) accumulates in int64
    (every additive operand is long-typed) with a product-scale term, yet
    the old whole-argument substring check saw 'decimal' and skipped it.
    Typing is per node now."""
    df = (
        spark.range(100)
        .select((F.col("id") * 100000).alias("y"))
        .agg(
            F.sum(
                F.col("y") * F.col("y")
                + F.col("y").cast("decimal(10,0)").cast("long")
            ).alias("s")
        )
    )
    sites = sum_product_sites(_plan(df))
    assert any("y * y" in s for s in sites), sites


def test_long_cast_of_decimal_product_flagged(spark):
    """A decimal-promoted product cast BACK to long re-enters the int64
    accumulation class at product magnitude — the promotion was undone
    before the sum buffer. Must flag (the old check saw 'decimal' and
    skipped)."""
    d = F.col("y").cast("decimal(19,0)")
    df = (
        spark.range(100)
        .select((F.col("id") * 100000).alias("y"))
        .agg(F.sum((d * d).cast("long")).alias("s"))
    )
    assert sum_product_sites(_plan(df)) != []


def test_double_promoted_mixed_sum_not_flagged(spark):
    """Converse: when Spark coerces the whole argument to double
    (sum(y*y + cast(y as double)) → IEEE accumulation), there is no
    volume class to flag — the interior long product is the per-row
    domain class the --stress gate covers, not this walk."""
    df = (
        spark.range(100)
        .select((F.col("id") * 100000).alias("y"))
        .agg(
            F.sum(
                F.col("y") * F.col("y") + F.col("y").cast("double")
            ).alias("s")
        )
    )
    assert sum_product_sites(_plan(df)) == []


def test_normalize_collapses_generated_constants():
    """Per-replicate salt literals normalize to one allowlist entry."""
    a = normalize("(key#12L * 614889281)")
    b = normalize("(key#99L * 918273645)")
    assert a == b == "(key * N)"


def test_registry_sites_all_justified(spark):
    """CI gate: every sum-of-int-product site in the live registry must
    carry a non-TODO justification, and the allowlist must not contain
    stale entries for plans that changed. A new query adding an
    unpromoted SUM(a*b) over longs fails HERE, not in a crashed bench
    three rounds later."""
    import tools.audit_overflow as ao

    sites = ao.collect_sites()
    with open(ALLOWLIST_PATH) as f:
        allow = json.load(f)
    missing = [
        (q, s)
        for q, ss in sites.items()
        for s in ss
        if not allow.get(q, {}).get(s) or allow[q][s].startswith("TODO")
    ]
    stale = [
        (q, s)
        for q, entries in allow.items()
        for s in entries
        if s not in sites.get(q, [])
    ]
    assert not missing, f"unjustified sum-of-int-product sites: {missing}"
    assert not stale, f"stale allowlist entries (plan changed): {stale}"


def test_floor_of_promoted_interior_still_flagged(spark):
    """FLOOR returns BIGINT whatever runs inside: the micro-nat fixed
    point sum(c * (FLOOR(ln(cast(n as double))*1e6+0.5) - ...)) is a
    long-accumulating product sum, and the 'as double' INSIDE the FLOOR
    call must not suppress it (live false negative caught by q243)."""
    df = (
        spark.range(2, 100)
        .selectExpr("id AS c", "id * 7 AS n")
        .agg(
            F.expr(
                "SUM(c * (CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000000.0"
                " + 0.5) AS BIGINT)"
                " - CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1000000.0"
                " + 0.5) AS BIGINT)))"
            ).alias("s")
        )
    )
    sites = sum_product_sites(_plan(df))
    assert sites, "FLOOR-of-ln product sum must be audited"
