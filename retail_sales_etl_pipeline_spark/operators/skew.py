"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting (on by default in session.py) handles most
runtime skew; these explicit forms cover the cases AQE can't: skewed
*aggregations* (one hot group key) and broadcast-infeasible skewed joins
on a known hot key.

Semantics are proven by tests: salted results must equal unsalted exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column name -> (partial_agg_expr, merge_agg_expr),
    e.g. ``{"n": (F.count(F.lit(1)), F.sum("n"))}``. Phase 1 aggregates on
    (keys + random salt) so a hot key's rows spread over ``salt_buckets``
    reducers; phase 2 merges the per-salt partials. Only aggregates with a
    partial/merge decomposition (count/sum/min/max, not count-distinct)
    are expressible this way — the same constraint Spark's own partial
    aggregation has.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[merge.alias(name) if not isinstance(merge, str) else F.expr(merge).alias(name)
          for name, (_, merge) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side.

    Each big row gets a random salt in [0, B); the small side is exploded
    B-fold with every salt value, and the join key becomes (key, salt) —
    a hot key's rows land on B different reducers instead of one. Use when
    the small side is too big to broadcast but B-fold replication is
    affordable (the classic middle ground).

    Only join types that never emit unmatched SMALL-side rows are allowed:
    under right/full outer, each unmatched small row would surface once per
    salt replica (B null-extended duplicates). Flip the sides and use
    'left' if you need to keep the small side's unmatched rows.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched small-side "
            f"rows {salt_buckets}x; allowed: inner/left/left_semi/left_anti"
        )
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_s.join(small_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
