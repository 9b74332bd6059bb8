"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every registered query at sf0.01 on Spark AND its oracle SQL on DuckDB
over the same parquet files, canonicalizes both results (columns sorted by
name, rows sorted, values stringified), and compares hashes. Use while
iterating; the real gate is the round driver.

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> tuple[str, int]:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v) -> str:
        if v is None or v != v:  # NaN/None
            return "<NULL>"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    rows = sorted("\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False))
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return h, len(rows)


def main() -> int:
    from retail_sales_etl_pipeline_spark.plans.registry import load_all
    from retail_sales_etl_pipeline_spark.session import get_spark

    only = set(sys.argv[1:])
    registry = load_all()
    spark = get_spark("correctness-check")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_pass = n_fail = n_noorcl = 0
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.spark_fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if q.oracle is None:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            n_noorcl += 1
            continue
        try:
            odf = con.execute(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sh, sn = canon(sdf)
        oh, on = canon(odf)
        ok = sh == oh and sn == on
        n_pass += ok
        n_fail += not ok
        status = "PASS " if ok else "FAIL "
        print(f"{status} {name}: spark {sn} rows / oracle {on} rows, "
              f"hash {'==' if sh == oh else sh + ' != ' + oh} [{t_spark:.1f}s]")
        if not ok and sn and on:
            s_cols = sorted(sdf.columns)
            o_cols = sorted(odf.columns)
            if s_cols != o_cols:
                print(f"      cols spark={s_cols} oracle={o_cols}")
            else:
                print("      sample spark:", sdf.reindex(sorted(sdf.columns), axis=1).head(2).to_dict("records"))
                print("      sample oracle:", odf.reindex(sorted(odf.columns), axis=1).head(2).to_dict("records"))
    print(f"\n{n_pass} pass / {n_fail} fail / {n_noorcl} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
