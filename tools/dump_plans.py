"""Dump ``explain('formatted')`` for registry queries to plans/r13/.

Usage:
    python tools/dump_plans.py before q259_prefix_pairs_capped q66_... [...]
    python tools/dump_plans.py after  q259_prefix_pairs_capped [...]

Writes plans/r13/<query>_<tag>.txt. Driver-side only (no job execution),
so it is safe to run alongside other work. The optimization judge checks
plan claims in OPTIMIZATION_r13.md against these files.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(ROOT, "plans", "r13")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "tag must be before|after"
    os.makedirs(OUT_DIR, exist_ok=True)

    from retail_sales_etl_pipeline_spark.plans.registry import load_all
    from retail_sales_etl_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = get_spark(
        "dump_plans", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    for name in names:
        q = registry[name]
        df = q.spark_fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
