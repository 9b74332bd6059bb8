"""Run the curation driver end-to-end at one gen-corpus scale and append
the timing to a scale-record JSON (round-10 verdict #7: the 1000x
family-level decade for the pipeline composition).

Usage: python tools/run_curation_scale.py 1000x [--out BENCH_SCALE_R11C.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    scale = sys.argv[1] if len(sys.argv) > 1 else "1000x"
    out_path = os.path.join(ROOT, "BENCH_SCALE_R11C.json")
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    sf_dir = os.path.join(ROOT, "bigdata", f"gen{scale}")

    from retail_sales_etl_pipeline_spark.plans import curation_pipeline
    from retail_sales_etl_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = get_spark("curation-scale", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = tempfile.mkdtemp(prefix=f"curation_{scale}_")
    t0 = time.time()
    curation_pipeline.run(spark, sf_dir, out_dir)
    dt = round(time.time() - t0, 3)
    shutil.rmtree(out_dir, ignore_errors=True)
    doc = {
        "metric": "scale_run",
        "recorded_at": int(time.time()),
        "queries": {"curation_driver_run": {scale: dt}},
        "note": "curation driver end-to-end (materialized stages) at "
                f"gen{scale}; single timed run after JVM start, "
                "no concurrent JVMs",
    }
    if os.path.exists(out_path):
        prev = json.load(open(out_path))
        prev.setdefault("queries", {}).setdefault(
            "curation_driver_run", {}
        )[scale] = dt
        prev["recorded_at"] = doc["recorded_at"]
        doc = prev
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"metric": "curation_scale_done", "scale": scale,
                      "sec": dt, "out": out_path}))


if __name__ == "__main__":
    main()
