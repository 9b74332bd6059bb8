"""Edge-density probe for the verified near-dup graph (r7 verdict #3).

The graph statistics family (q164/q172/q188/q199-q201/q208/q209/q211/
q230/q234) consumes q21's verified pair set. Their 100x second-decade
wall-time ratios sat at 7-9x for 10x rows (BENCH_SCALE_R7.json), which is
either (a) the JVM floor washing out of the 10x denominator or (b) the
edge set genuinely densifying — a distribution-matched corpus on a
bounded vocab could grow verified pairs super-linearly. Wall time alone
cannot distinguish them; the decisive number is EDGES PER NODE per scale.

For each scale this probe executes the q21 plan once and records:
  n_docs           corpus documents (graph node universe)
  n_pairs          verified near-dup pairs (undirected edges)
  n_graph_nodes    documents with >= 1 verified edge
  edges_per_node   2*n_pairs / n_graph_nodes (mean verified degree)
  max_degree       hottest node's verified degree
  p99_degree       99th-percentile degree (exact, via histogram CDF)

If edges_per_node is ~flat across decades, the 7-9x ratios are cost-floor
wash-out and no cap is needed; if it grows, the verified edge set needs a
per-node degree cap with a reported-loss counter (the q59 bucket-cap
pattern applied to edges).

Usage: python tools/probe_edge_density.py [--scales 1x,10x,100x,1000x]
           [--out EDGE_DENSITY.json]
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
    "1000x": os.path.join(ROOT, "bigdata", "gen1000x"),
}


def main() -> None:
    scales = ["1x", "10x", "100x", "1000x"]
    out_path = os.path.join(ROOT, "EDGE_DENSITY.json")
    args = sys.argv[1:]
    if "--scales" in args:
        scales = args[args.index("--scales") + 1].split(",")
    if "--out" in args:
        out_path = args[args.index("--out") + 1]

    from pyspark.sql import functions as F

    from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
        q21_ngram_jaccard_pairs,
    )
    from retail_sales_etl_pipeline_spark.session import get_spark
    from retail_sales_etl_pipeline_spark.sources import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = get_spark(
        "edge-density", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for scale in scales:
        sf_dir = SCALE_DIRS[scale]
        t0 = time.time()
        n_docs = load_table(spark, sf_dir, "documents").count()
        pairs = q21_ngram_jaccard_pairs(spark, sf_dir).select(
            "doc_a", "doc_b"
        )
        # degree relation: each undirected pair contributes one endpoint
        # row per side; one shuffle on doc id, then tiny aggregates
        deg = (
            pairs.select(F.col("doc_a").alias("d"))
            .unionAll(pairs.select(F.col("doc_b").alias("d")))
            .groupBy("d")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
        deg = deg.persist()
        row = deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_graph_nodes"),
            F.sum("deg").cast("long").alias("deg_sum"),
            F.max("deg").cast("long").alias("max_degree"),
        ).collect()[0]
        # exact p99 over the BOUNDED degree-histogram frame (the
        # histogram-CDF pattern): degrees are small ints, so the
        # histogram has at most max_degree distinct buckets
        hist = (
            deg.groupBy("deg")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .orderBy("deg")
            .collect()
        )
        deg.unpersist()
        total = sum(r.cnt for r in hist)
        cum = 0
        p99 = None
        for r in hist:
            cum += r.cnt
            if p99 is None and 100 * cum >= 99 * total:
                p99 = r.deg
        # SUM/MAX over an empty degree frame are NULL (None): a corpus
        # with zero verified pairs must record a zero-density scale, not
        # crash the probe on None // 2.
        n_pairs = (row.deg_sum or 0) // 2
        results[scale] = {
            "n_docs": n_docs,
            "n_pairs": int(n_pairs),
            "n_graph_nodes": row.n_graph_nodes,
            "edges_per_node": round(
                (row.deg_sum or 0) / row.n_graph_nodes, 3
            ) if row.n_graph_nodes else 0.0,
            "max_degree": row.max_degree or 0,
            "p99_degree": p99 or 0,
            "probe_seconds": round(time.time() - t0, 1),
        }
        print(f"{scale}: {json.dumps(results[scale])}", file=sys.stderr,
              flush=True)
        spark.catalog.clearCache()
        with open(out_path, "w") as f:
            json.dump(
                {"metric": "neardup_edge_density", "scales": results},
                f, indent=1, sort_keys=True,
            )
            f.write("\n")
    print(json.dumps({"metric": "edge_density_done", "out": out_path}))


if __name__ == "__main__":
    main()
