"""EDIT_PREFIX cost/recall sweep for q163 (round-6 directive #4).

q163's banded Levenshtein verify is the priciest verification rung at
gen100x (250 s in the round-5 record); its cost knob is the DP area —
cells ∝ EDIT_PREFIX². The committed analysis PREDICTED that halving the
prefix would roughly quarter the cost but asserted the recall side in
prose. This tool measures both at generator scale:

  for prefix in {256, 128, 64} at each --scales entry:
    - wall time of the full verify plan (noop write — same action shape
      as bench.py);
    - the verified pair SET, compared against the prefix=256 reference:
      n_pairs, pairs missed vs 256, spurious pairs vs 256 (a shorter
      prefix both misses char-level rewrites that diverge late AND
      over-accepts docs that only agree early — both directions are
      recall facts worth recording, not just the miss count).

Results → SWEEP_EDIT_PREFIX.json; the table is summarized in
BASELINE.md and justifies the shipped default.

Usage: python tools/sweep_edit_prefix.py [--scales 10x,100x]
           [--prefixes 256,128,64] [--out SWEEP_EDIT_PREFIX.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_DIRS = {
    "1x": os.path.join(ROOT, "bigdata", "gen1x"),
    "10x": os.path.join(ROOT, "bigdata", "gen10x"),
    "100x": os.path.join(ROOT, "bigdata", "gen100x"),
}


def main() -> None:
    scales = ["10x", "100x"]
    prefixes = [256, 128, 64]
    out_path = os.path.join(ROOT, "SWEEP_EDIT_PREFIX.json")
    args = sys.argv[1:]
    if "--scales" in args:
        scales = args[args.index("--scales") + 1].split(",")
    if "--prefixes" in args:
        prefixes = [int(p) for p in
                    args[args.index("--prefixes") + 1].split(",")]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]

    from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
        edit_distance_verify,
    )
    from retail_sales_etl_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = get_spark("sweep-edit-prefix", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    def cleanup() -> None:
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()

    # JVM/codegen warm-up (untimed): one full run at the smallest scale
    edit_distance_verify(spark, SCALE_DIRS[scales[0]], prefixes[0]) \
        .write.format("noop").mode("overwrite").save()
    cleanup()

    doc: dict = {"metric": "edit_prefix_sweep", "prefixes": prefixes,
                 "scales": {}}
    for scale in scales:
        sf_dir = SCALE_DIRS[scale]
        rows: dict[str, dict] = {}
        ref_pairs: set | None = None
        for prefix in prefixes:
            t0 = time.time()
            edit_distance_verify(spark, sf_dir, prefix) \
                .write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 3)
            cleanup()
            pairs = {
                (r.doc_a, r.doc_b)
                for r in edit_distance_verify(spark, sf_dir, prefix)
                .select("doc_a", "doc_b").collect()
            }
            cleanup()
            if ref_pairs is None:  # first prefix is the reference
                ref_pairs = pairs
            rows[str(prefix)] = {
                "wall_s": wall,
                "n_pairs": len(pairs),
                "missed_vs_ref": len(ref_pairs - pairs),
                "spurious_vs_ref": len(pairs - ref_pairs),
            }
            print(f"{scale} prefix={prefix}: {wall}s, {len(pairs)} pairs, "
                  f"missed {len(ref_pairs - pairs)}, "
                  f"spurious {len(pairs - ref_pairs)}",
                  file=sys.stderr, flush=True)
            doc["scales"][scale] = rows
            with open(out_path, "w") as f:
                json.dump(doc, f, indent=1, sort_keys=True)
                f.write("\n")
    print(json.dumps({"metric": "edit_prefix_sweep_done", "out": out_path}))


if __name__ == "__main__":
    main()
