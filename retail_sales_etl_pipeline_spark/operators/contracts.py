"""Declarative data-contract auditing — the dbt-tests / Great-
Expectations engine surface, Spark-first.

A contract is (name, table, violation predicate). The auditor groups
contracts BY TABLE and evaluates every rule on a table in ONE scan —
N rules cost one pass of SUM(CASE...) partial aggregates, never N
scans — then unions the per-table results into one report. Cross-
table rules (referential integrity, cross-field orderings through a
join) declare the join they need and ride it once.

The reference's ingestion guards (row-count gate, file-existence
check — dag1_ingest_csv.py:26-39) are two hardcoded instances of this
shape; this operator is the general form its warehouse loads would
grow into.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Contract:
    """One rule: ``violation_when`` is a SQL boolean over the table's
    columns that is TRUE for rows violating the contract."""

    name: str
    table: str
    violation_when: str


def audit_contracts(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    contracts: list[Contract],
) -> DataFrame:
    """One report row per contract: rows checked, violations, exact
    ppm. All contracts on one table share a single scan."""
    out: DataFrame | None = None
    by_table: dict[str, list[Contract]] = {}
    for c in contracts:
        by_table.setdefault(c.table, []).append(c)
    for table, rules in by_table.items():
        df = tables[table]
        aggs = [F.count(F.lit(1)).cast("long").alias("n_checked")] + [
            F.sum(F.expr(c.violation_when).cast("long"))
            .cast("long")
            .alias(f"v_{i}")
            for i, c in enumerate(rules)
        ]
        wide = df.agg(*aggs)
        # unpivot the ONE wide row with stack() — a per-rule selectExpr
        # + union would re-execute the scan+aggregate once per rule
        # (Spark unions do not share subplans), which is exactly the
        # N-scans cost this operator exists to avoid
        pairs = ", ".join(f"'{c.name}', v_{i}" for i, c in enumerate(rules))
        rows = wide.selectExpr(
            "n_checked",
            f"stack({len(rules)}, {pairs}) AS (contract, n_violations)",
        ).selectExpr(
            "contract",
            f"'{table}' AS table_name",
            "n_checked",
            "n_violations",
            "CAST(n_violations * 1000000 div n_checked AS BIGINT)"
            " AS violation_ppm",
        )
        out = rows if out is None else out.unionByName(rows)
    assert out is not None, "no contracts given"
    return out
