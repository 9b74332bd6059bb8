"""Streaming bench: drive the stateful streaming operators over a
bench-scale events corpus in real micro-batches and record throughput.

The streaming equivalence tests run on tiny fixtures; this harness is the
evidence the stateful operators hold up beyond toy state sizes: a
file-source stream of the 10x events corpus (1M rows, 15k users — 10x the
sf0.1 bench table) processed in N micro-batches through

  - watermarked sliding-window counts (windowed_event_counts),
  - per-user stateful debounce (applyInPandasWithState; state = one long
    per user, 15k concurrent keys),
  - content-fingerprint dedup (dropDuplicatesWithinWatermark),

each driven to completion with trigger(availableNow) — the run model of a
catch-up/backfill on a real stream. For the debounce, the batch twin
(q100's kept-relative pandas recompute on the same data) is asserted
row-identical, so the throughput number belongs to a verified-correct
operator, not a lucky one. Results land in BENCH_STREAMING.json and the
headline numbers in BASELINE.md.

Usage: python tools/bench_streaming.py [--events DIR] [--files N]
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
DEFAULT_EVENTS = os.path.join(ROOT, "bigdata", "gen10x", "events.parquet")
N_FILES = 20


def main() -> None:
    events_path = DEFAULT_EVENTS
    n_files = N_FILES
    args = sys.argv[1:]
    if "--events" in args:
        events_path = args[args.index("--events") + 1]
    if "--files" in args:
        n_files = int(args[args.index("--files") + 1])

    from retail_sales_etl_pipeline_spark.session import get_spark
    from retail_sales_etl_pipeline_spark.streaming import (
        dedup_stream_within_watermark,
        fingerprint_events,
        read_events_stream,
        windowed_event_counts,
    )
    from retail_sales_etl_pipeline_spark.streaming.debounce import (
        debounce_events,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = get_spark(
        "bench-streaming", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_bench_")
    src_dir = os.path.join(work, "events_files")
    # multi-file layout -> maxFilesPerTrigger yields real micro-batches.
    # Slices are TIME-ORDERED and written sequentially: the file source
    # orders discovered files by modification time, so micro-batches
    # arrive in event-time order — the at-ingest assumption the
    # kept-relative debounce documents (its state carries across batches
    # in arrival order).
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.parquet(events_path)
    n_rows = ev.count()
    w = Window.orderBy("ts", "event_id")
    sliced = ev.withColumn(
        "slice",
        ((F.row_number().over(w) - 1) * n_files / n_rows).cast("int"),
    )
    sliced.cache()
    for k in range(n_files):
        (
            sliced.filter(F.col("slice") == k)
            .drop("slice")
            .coalesce(1)
            .write.mode("append")
            .parquet(src_dir)
        )
    sliced.unpersist()

    results: dict[str, dict] = {"n_rows": n_rows, "n_files": n_files,
                                "events_path": events_path}

    def drive(name: str, df, extra: dict | None = None) -> None:
        out = os.path.join(work, f"sink_{name}")
        ckpt = os.path.join(work, f"ckpt_{name}")
        t0 = time.time()
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        batches = len(q.recentProgress)
        out_rows = spark.read.parquet(out).count()
        results[name] = {
            "seconds": round(dt, 2),
            "rows_per_sec": int(n_rows / dt),
            "micro_batches": batches,
            "output_rows": out_rows,
            **(extra or {}),
        }
        print(f"{name}: {dt:.1f}s, {int(n_rows/dt)} rows/s, "
              f"{batches} micro-batches, {out_rows} output rows",
              file=sys.stderr, flush=True)

    stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
    drive("windowed_counts",
          windowed_event_counts(stream, window="1 hour", slide="15 minutes",
                                watermark="2 hours"))

    stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
    n_users = ev.select("user_id").distinct().count()
    drive("stateful_debounce", debounce_events(stream),
          extra={"state_keys": n_users})

    stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
    drive("watermark_dedup",
          dedup_stream_within_watermark(fingerprint_events(stream)))

    # correctness at this scale: the debounce survivors equal the batch
    # kept-relative recompute on the same rows (same session, same zone)
    import pandas as pd  # noqa: F401

    got = {
        (r.event_id, r.user_id)
        for r in spark.read.parquet(
            os.path.join(work, "sink_stateful_debounce")
        ).collect()
    }
    pdf = (
        ev.selectExpr(
            "event_id", "user_id",
            "timestampdiff(MICROSECOND, TIMESTAMP '1970-01-01', ts) AS us",
        )
        .toPandas()
        .sort_values(["user_id", "us", "event_id"])
    )
    gap = 600 * 1_000_000
    want = set()
    last: dict[int, int] = {}
    for eid, uid, us in pdf.itertuples(index=False):
        if uid not in last or us - last[uid] > gap:
            want.add((eid, uid))
            last[uid] = us
    results["debounce_matches_batch_twin"] = got == want
    print(f"debounce stream==batch: {got == want} "
          f"({len(got)} survivors)", file=sys.stderr)

    out_path = os.path.join(ROOT, "BENCH_STREAMING.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"metric": "streaming_bench_done", "out": out_path}))


if __name__ == "__main__":
    main()
