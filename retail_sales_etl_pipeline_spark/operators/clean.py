"""Cleaning stage (reference dag2_clean_validate.py, Spark-first).

The reference cleans by four destructive DELETEs against the staging table,
each a full table rewrite in Postgres. Functionally each stage is just
``df -> df.filter(...)`` (SURVEY §2.11 M4), so the whole chain composes into
ONE logical plan: Catalyst collapses the three predicate stages into a
single pushed-down scan filter, and the dedup window is the only shuffle.
Stage order is preserved from the reference task chain
(dag2_clean_validate.py:216): nulls → duplicates → zero-qty → invalid-price.
Order matters: F2's ``quantity != 0`` silently drops NULL quantities too,
which only matches DELETE semantics because F1 removed them first.

Per-stage removed-row counts (the reference reads cur.rowcount,
dag2_clean_validate.py:36,65,82,99) are computed with one aggregate pass per
stage boundary — counts, not extra table rewrites.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Columns that must be present for a row to survive F1 (reference
# dag2_clean_validate.py:28-34). CustomerID/Description/Country may be NULL.
REQUIRED_COLUMNS = ("invoice_no", "stock_code", "quantity", "invoice_date", "unit_price")

# W1 dedup key (reference dag2_clean_validate.py:52-58): Description and
# Country are deliberately EXCLUDED — the survivor contributes its own
# values for those columns.
DEDUP_KEY = (
    "invoice_no",
    "stock_code",
    "quantity",
    "invoice_date",
    "unit_price",
    # COALESCE(customer_id,'') — NULL customers group together
)


def remove_nulls(df: DataFrame) -> DataFrame:
    """F1: drop rows where any required column is NULL."""
    return df.dropna(subset=list(REQUIRED_COLUMNS))


def remove_duplicates(df: DataFrame, order_col: str = "load_seq") -> DataFrame:
    """W1: keep the first row (by ingest order) of each dedup-key group.

    ``dropDuplicates`` would give the same row *set* only when
    description/country never differ within a group; the window form is
    exact (SURVEY §7.4.2).
    """
    key = [F.col(c) for c in DEDUP_KEY] + [F.coalesce(F.col("customer_id"), F.lit(""))]
    w = Window.partitionBy(*key).orderBy(F.col(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def remove_zero_quantities(df: DataFrame) -> DataFrame:
    """F2: drop quantity == 0; negatives are returns and are KEPT
    (reference dag2_clean_validate.py:72-86)."""
    return df.filter(F.col("quantity") != 0)


def remove_invalid_prices(df: DataFrame) -> DataFrame:
    """F3: drop unit_price <= 0 (reference dag2_clean_validate.py:89-103)."""
    return df.filter(F.col("unit_price") > 0)


@dataclass(frozen=True)
class StageMetric:
    stage_name: str
    rows_before: int
    rows_after: int

    @property
    def rows_removed(self) -> int:
        return self.rows_before - self.rows_after


@dataclass(frozen=True)
class CleanResult:
    df: DataFrame
    metrics: list[StageMetric]

    @property
    def rows_after(self) -> int:
        return self.metrics[-1].rows_after

    def unpersist(self) -> None:
        """Release the cached final stage. With collect_metrics=True the
        returned ``df`` stays cached (each intermediate was already
        unpersisted); callers must release it after their downstream
        writes, or repeated runs on one session accumulate cached
        partitions."""
        self.df.unpersist()


def clean_staging(df: DataFrame, collect_metrics: bool = True) -> CleanResult:
    """Full cleaning chain in reference order, with per-stage metrics.

    When ``collect_metrics`` is False this is one lazy plan with zero
    actions — the scale path. With metrics on, each boundary costs one
    count() over a cached intermediate (still no table rewrites).
    """
    stages = [
        ("remove_nulls", remove_nulls),
        ("remove_duplicates", remove_duplicates),
        ("remove_zero_quantities", remove_zero_quantities),
        ("remove_invalid_prices", remove_invalid_prices),
    ]
    metrics: list[StageMetric] = []
    if not collect_metrics:
        out = df
        for _, fn in stages:
            out = fn(out)
        return CleanResult(out, metrics)

    cur = df
    cur.cache()
    before = cur.count()
    for name, fn in stages:
        nxt = fn(cur).cache()
        after = nxt.count()
        metrics.append(StageMetric(name, before, after))
        cur.unpersist()
        cur, before = nxt, after
    return CleanResult(cur, metrics)
