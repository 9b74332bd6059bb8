"""Shared canonicalization for Spark-vs-DuckDB differential tests.

Mirrors the round driver's comparison: columns sorted by name, rows sorted,
values stringified, order-insensitive.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def canon(df: pd.DataFrame) -> tuple[str, int]:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v) -> str:
        if v is None or v != v:
            return "<NULL>"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    rows = sorted("\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False))
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return h, len(rows)


def assert_matches_oracle(spark_df, duck_con, sql: str, name: str = "") -> None:
    sh, sn = canon(spark_df.toPandas())
    oh, on = canon(duck_con.execute(sql).df())
    assert sn == on, f"{name}: row count spark={sn} oracle={on}"
    assert sh == oh, f"{name}: value hash mismatch ({sn} rows)"
