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

Round-6 state-growth fix flags:
  --rocksdb   run stateful queries on the RocksDB state store provider
              (off-heap working set, incremental/changelog checkpoints)
  --expire    debounce with expire_state=True (event-time timeout at
              last_kept+gap — provably identical survivors, state
              bounded by users active within one window of the
              watermark instead of users ever seen)
  --only-debounce   run just the stateful debounce + its batch-twin
              assertion (the decade re-measurement loop)

  --kll       run ONLY the streaming KLL sketch rollup (r8 directive #7):
              foreachBatch merges per-batch shard sketches into a running
              sketch; diffed against (a) a bit-identical batch REPLAY of
              the same slices and (b) the one-shot q241-shaped batch
              sketch under the merge contract (exact weight + rank
              certification). Records matches_batch_twin.

Usage: python tools/bench_streaming.py [--events DIR] [--files N]
           [--rocksdb] [--expire] [--only-debounce] [--kll]
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
    use_rocksdb = "--rocksdb" in args
    use_expire = "--expire" in args
    only_debounce = "--only-debounce" in args
    only_kll = "--kll" in args

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
    if use_rocksdb:
        # session-level conf is captured by each streaming query at start;
        # changelog checkpointing uploads per-batch deltas instead of
        # re-snapshotting the whole store.
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )

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
    # min==0 and max==n-1 alone admit duplicated/gapped ids (r7 advisory):
    # such a corpus would pass the probe yet slice unevenly with
    # within-slice event-time disorder, silently violating the debounce's
    # arrival-order contract. countDistinct==n_rows closes that — min/max
    # pinned at the ends + n distinct values forces exactly {0..n-1}.
    probe = ev.agg(
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
        F.countDistinct("event_id").alias("nd"),
    ).collect()[0]
    if probe.lo == 0 and probe.hi == n_rows - 1 and probe.nd == n_rows:
        # Generated corpora carry DENSE ORDINAL event_ids assigned in
        # time order (gen_scale_corpus sorts ts and ids in lockstep), so
        # the time-ordered slice is a pure MAP expression — no global
        # window. The round-7 1000x attempt proved the window form does
        # not survive 100M rows in one partition (single-task sort +
        # one giant cache block killed the JVM); this path writes all
        # slices in ONE partitioned pass instead of n_files re-scans.
        sliced = ev.withColumn(
            "slice",
            (F.col("event_id") * n_files / F.lit(n_rows)).cast("int"),
        )
        # ONE time-sorted file per slice: repartition by slice (each
        # slice lands wholly in one task) and sort within the task, so
        # every micro-batch file honors the debounce's arrival-order ==
        # event-time-order contract. A plain partitionBy write emits one
        # part file PER INPUT TASK per slice with identical mtimes —
        # multi-hour disorder inside a slice, which is what surfaced the
        # operator's late-key timeout bug at 100M rows.
        (
            sliced.repartition(n_files, "slice")
            .sortWithinPartitions("ts", "event_id")
            .write.partitionBy("slice")
            .mode("overwrite")
            .parquet(src_dir)
        )
        # the file source orders discovered files by modification time;
        # re-stamp them in slice order so micro-batches arrive in event
        # time, exactly like the sequential writes did.
        import glob as _glob
        import re as _re

        t0 = time.time() - n_files * 2
        for d in sorted(
            _glob.glob(os.path.join(src_dir, "slice=*")),
            key=lambda p: int(_re.search(r"slice=(\d+)", p).group(1)),
        ):
            k = int(_re.search(r"slice=(\d+)", d).group(1))
            for fpath in _glob.glob(os.path.join(d, "*.parquet")):
                os.utime(fpath, (t0 + 2 * k, t0 + 2 * k))
    else:
        w = Window.orderBy("ts", "event_id")
        sliced = ev.withColumn(
            "slice",
            # row_number is INT: at 100M rows * 200 files the product
            # crosses int32 under ANSI — promote to long first
            (
                (F.row_number().over(w).cast("long") - 1) * n_files / n_rows
            ).cast("int"),
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
                                "events_path": events_path,
                                "state_store": (
                                    "rocksdb" if use_rocksdb else "hdfs"),
                                "debounce_expire_state": use_expire}

    def drive(name: str, df, extra: dict | None = None):
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
        return q

    if only_kll:
        # --- streaming KLL sketch rollup twin ---------------------------
        import glob as _glob

        from retail_sales_etl_pipeline_spark.operators.kll import (
            total_weight,
        )
        from retail_sales_etl_pipeline_spark.streaming.kll_rollup import (
            KllRollup,
            certify_against_exact,
            exact_centi_hist,
            one_shot_sketch,
            sketches_identical,
        )

        rollup = KllRollup()
        ckpt = os.path.join(work, "ckpt_kll")
        t0 = time.time()
        q = (
            read_events_stream(spark, src_dir, max_files_per_trigger=1)
            .writeStream.outputMode("append")
            .foreachBatch(rollup.sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        print(f"kll_rollup stream: {dt:.1f}s, {int(n_rows/dt)} rows/s, "
              f"{rollup.n_batches} micro-batches, budget={rollup.budget}",
              file=sys.stderr, flush=True)

        # (a) replay twin: fold the slice files in the stream's discovery
        # order (mtime — re-stamped in slice order above) in BATCH mode;
        # the deterministic compactor must reproduce the sketch EXACTLY.
        replay = KllRollup()
        slice_files = sorted(
            _glob.glob(os.path.join(src_dir, "**", "*.parquet"),
                       recursive=True),
            key=os.path.getmtime,
        )
        for fpath in slice_files:
            replay.fold_batch(
                spark.read.schema(
                    "event_id long, ts timestamp, user_id long, "
                    "event_type string, value double, props string"
                ).parquet(fpath)
            )
        replay_identical = sketches_identical(
            rollup.snapshot(), replay.snapshot()
        )

        # (b) merge-contract diff vs the one-shot q241-shaped sketch
        batch_levels, batch_budget = one_shot_sketch(ev)
        hist = exact_centi_hist(ev)
        stream_cert = certify_against_exact(*rollup.snapshot(), hist)
        batch_cert = certify_against_exact(batch_levels, batch_budget, hist)
        matches = (
            replay_identical
            and stream_cert["weight_preserved"]
            and batch_cert["weight_preserved"]
            and stream_cert["certified_all"]
            and batch_cert["certified_all"]
        )
        results["kll_rollup"] = {
            "seconds": round(dt, 2),
            "rows_per_sec": int(n_rows / dt),
            "micro_batches": rollup.n_batches,
            "stream_budget": rollup.budget,
            "batch_budget": batch_budget,
            "sketch_weight": total_weight(rollup.levels),
            "replay_identical": replay_identical,
            "stream_quantiles": {
                str(k): v for k, v in stream_cert["quantiles"].items()
            },
            "batch_quantiles": {
                str(k): v for k, v in batch_cert["quantiles"].items()
            },
        }
        results["kll_matches_batch_twin"] = matches
        print(f"kll stream==batch: replay_identical={replay_identical}, "
              f"weight={total_weight(rollup.levels)}/{n_rows}, "
              f"certified stream={stream_cert['certified_all']} "
              f"batch={batch_cert['certified_all']}",
              file=sys.stderr)

        out_path = os.path.join(ROOT, "BENCH_STREAMING.json")
        label = (
            f"{os.path.basename(os.path.dirname(events_path))}"
            f"_{n_rows // 1_000_000}M_rows_kll_rollup"
        )
        doc = {}
        if os.path.exists(out_path):
            with open(out_path) as f:
                doc = json.load(f)
        doc[label] = results
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.write("\n")
        shutil.rmtree(work, ignore_errors=True)
        print(json.dumps({"metric": "streaming_bench_done",
                          "out": out_path, "label": label}))
        return

    if not only_debounce:
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        drive("windowed_counts",
              windowed_event_counts(stream, window="1 hour",
                                    slide="15 minutes", watermark="2 hours"))

    stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
    n_users = ev.select("user_id").distinct().count()
    dq = drive("stateful_debounce",
               debounce_events(stream, expire_state=use_expire),
               extra={"state_keys": n_users})
    # final store size: with expire_state the live rows should track
    # users active near the stream head, not users ever seen
    try:
        results["stateful_debounce"]["final_state_rows"] = (
            dq.lastProgress["stateOperators"][0]["numRowsTotal"]
        )
    except Exception:  # noqa: BLE001
        pass

    if not only_debounce:
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        drive("watermark_dedup",
              dedup_stream_within_watermark(fingerprint_events(stream)))

    # correctness at this scale: the debounce survivors equal the batch
    # kept-relative recompute on the same rows (same session, same zone).
    # FULLY DISTRIBUTED comparison: the first 100M-row run crashed here
    # collecting 98.5M survivor pairs into the driver (maxResultSize) —
    # the twin is recomputed per user with an Arrow grouped map and
    # diffed with exceptAll in both directions, so the check itself now
    # scales like the operator it verifies.
    got = spark.read.parquet(
        os.path.join(work, "sink_stateful_debounce")
    ).select("event_id", "user_id")
    base = ev.selectExpr(
        "event_id", "user_id",
        "timestampdiff(MICROSECOND, TIMESTAMP '1970-01-01', ts) AS us",
    )

    def kept_relative(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["us", "event_id"])
        gap = 600 * 1_000_000
        last = None
        keep_eid, keep_uid = [], []
        for eid, uid, us in zip(pdf["event_id"], pdf["user_id"], pdf["us"]):
            if last is None or us - last > gap:
                keep_eid.append(eid)
                keep_uid.append(uid)
                last = us
        return pd.DataFrame({"event_id": keep_eid, "user_id": keep_uid})

    want = base.groupBy("user_id").applyInPandas(
        kept_relative, "event_id long, user_id long"
    )
    n_got = got.count()
    missing = want.exceptAll(got).count()
    extra = got.exceptAll(want).count()
    results["debounce_matches_batch_twin"] = missing == 0 and extra == 0
    results["twin_diff"] = {"missing": missing, "extra": extra}
    print(f"debounce stream==batch: {missing == 0 and extra == 0} "
          f"({n_got} survivors; missing={missing} extra={extra})",
          file=sys.stderr)

    if only_debounce:
        out_path = os.path.join(ROOT, "BENCH_STREAMING.json")
        label = (
            f"{os.path.basename(os.path.dirname(events_path))}"
            f"_{n_rows // 1_000_000}M_rows"
            f"_{results['state_store']}"
            f"{'_expire' if use_expire else ''}_debounce"
        )
        doc = {}
        if os.path.exists(out_path):
            with open(out_path) as f:
                doc = json.load(f)
        doc[label] = results
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.write("\n")
        shutil.rmtree(work, ignore_errors=True)
        print(json.dumps({"metric": "streaming_bench_done",
                          "out": out_path, "label": label}))
        return

    # --- update-mode stateful twins (collected via foreachBatch) -------
    # interval union / EWMA emit per-key running rows in update mode (no
    # parquet append); drive them with a collecting sink and assert the
    # final emissions equal their batch queries over the same corpus.
    from retail_sales_etl_pipeline_spark.plans.event_queries import (
        q170_interval_union,
        q179_ewma_features,
        q173_distribution_drift_psi,
        PSI_SPLIT_TS,
    )
    from retail_sales_etl_pipeline_spark.streaming.stateful import (
        ewma_running,
        interval_union_running,
    )
    from retail_sales_etl_pipeline_spark.streaming.drift import (
        bin_counts_stream,
        psi_against_reference,
    )

    sf_dir = os.path.dirname(events_path)

    def drive_update(name: str, df, final_cols, batch_df, key_col,
                     extra: dict | None = None) -> None:
        ckpt = os.path.join(work, f"ckpt_{name}")
        last: dict = {}
        n_emissions = 0

        def sink(bdf, _bid):
            nonlocal n_emissions
            rows = bdf.collect()
            n_emissions += len(rows)
            for r in rows:
                last[r[key_col]] = tuple(r[c] for c in final_cols)

        t0 = time.time()
        q = (
            df.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        batch = {
            r[key_col]: tuple(r[c] for c in final_cols)
            for r in batch_df.collect()
        }
        results[name] = {
            "seconds": round(dt, 2),
            "rows_per_sec": int(n_rows / dt),
            "micro_batches": len(q.recentProgress),
            "state_keys": len(last),
            "emissions": n_emissions,
            "final_state_equals_batch_query": last == batch,
            **(extra or {}),
        }
        print(f"{name}: {dt:.1f}s, {int(n_rows/dt)} rows/s, "
              f"stream==batch: {last == batch}", file=sys.stderr, flush=True)

    stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
    drive_update(
        "stateful_interval_union",
        interval_union_running(stream),
        ("n_islands", "n_spans", "covered_us"),
        q170_interval_union(spark, sf_dir),
        "user_id",
    )

    stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
    drive_update(
        "stateful_ewma",
        ewma_running(stream),
        ("n_used", "ewma_micro"),
        q179_ewma_features(spark, sf_dir),
        "user_id",
    )

    # drift monitor: complete-mode bin counts + per-batch PSI vs the
    # early-window reference; final PSI must equal the batch q173 total
    ref = bin_counts_stream(
        spark.read.parquet(src_dir).filter(
            F.col("ts") < F.lit(PSI_SPLIT_TS).cast("timestamp")
        )
    ).cache()
    ref.count()
    late_dir = os.path.join(work, "late_files")
    late = spark.read.parquet(src_dir).filter(
        F.col("ts") >= F.lit(PSI_SPLIT_TS).cast("timestamp")
    )
    late.coalesce(4).write.mode("overwrite").parquet(late_dir)
    psi_readings: list[int] = []

    def psi_sink(bdf, _bid):
        psi = psi_against_reference(bdf, ref)
        if psi is not None:
            psi_readings.append(psi)

    t0 = time.time()
    q = (
        bin_counts_stream(read_events_stream(spark, late_dir,
                                             max_files_per_trigger=1))
        .writeStream.outputMode("complete")
        .foreachBatch(psi_sink)
        .option("checkpointLocation", os.path.join(work, "ckpt_drift"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.time() - t0
    batch_psi = (
        q173_distribution_drift_psi(spark, sf_dir)
        .agg(F.sum("psi_contrib_micro").alias("s")).collect()[0]["s"]
    )
    results["drift_monitor"] = {
        "seconds": round(dt, 2),
        "psi_readings": len(psi_readings),
        "final_psi_micro": psi_readings[-1] if psi_readings else None,
        "final_psi_equals_batch_q173": (
            bool(psi_readings) and psi_readings[-1] == batch_psi
        ),
    }
    print(f"drift_monitor: {dt:.1f}s, final PSI {psi_readings[-1:]} "
          f"== batch: {results['drift_monitor']['final_psi_equals_batch_q173']}",
          file=sys.stderr, flush=True)

    out_path = os.path.join(ROOT, "BENCH_STREAMING.json")
    label = (
        f"{os.path.basename(os.path.dirname(events_path))}"
        f"_{n_rows // 1_000_000}M_rows"
    )
    doc: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            doc = json.load(f)
    doc[label] = results
    doc.setdefault(
        "note",
        "file-source micro-batch runs driven with trigger(availableNow);"
        " time-ordered slices; *_equals_batch flags assert the streaming"
        " operator's final state equals its batch-query twin in-run",
    )
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"metric": "streaming_bench_done", "out": out_path}))


if __name__ == "__main__":
    main()
