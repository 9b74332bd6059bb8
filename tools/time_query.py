"""Time individual registry queries in isolation (noop sink, best-of-N).

Usage:
    python tools/time_query.py [-n REPEATS] q259_prefix_pairs_capped [...]

Same methodology as bench.py (noop-format write, cache cleanup between
runs, best-of-N) so numbers are comparable to BENCH_LOCAL.json rows, but
without paying the full 268-query sweep while iterating on one operator.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from retail_sales_etl_pipeline_spark.plans.registry import load_all
    from retail_sales_etl_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = get_spark(
        "time_query", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    def cleanup() -> None:
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()

    # one warmup to absorb first-call codegen/class-loading
    registry[args.names[0]].spark_fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    cleanup()

    out = {}
    for name in args.names:
        q = registry[name]
        runs = []
        for _ in range(args.n):
            t0 = time.time()
            q.spark_fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
            cleanup()
        out[name] = {"best": min(runs), "runs": runs}
        print(f"{name} best={min(runs)} runs={runs}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
