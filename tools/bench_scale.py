"""Scale-run harness: execute the registry's document/embedding/event
families at 1x / 10x / 100x of sf0.1 density (tools/gen_scale_corpus.py
corpora) and record per-query scaling factors.

This is the round's evidence that the 100 TB design claims hold when
EXECUTED, not just read off plan shapes: every family must grow
<= ~linearly in rows (banded dedup never goes quadratic, CC rounds stay
logarithmic, ANN probes stay bounded, caps bite instead of exploding).

Method notes (recorded in BASELINE.md alongside the results):
  - same session, same confs (local[N], shuffle=N) for every scale; RDD/
    cache cleanup between queries, exactly like bench.py;
  - noop-format write action (full distributed plan, nothing collected);
  - single timed run per (query, scale) after a one-query JVM warm-up —
    at 10x/100x runtimes dwarf codegen noise, and at 1x the constant
    overhead only makes measured growth look WORSE (super-linear),
    never better, so the linearity conclusion is conservative;
  - results flushed to BENCH_SCALE.json after every query so a hung
    query can't destroy the record.

Usage: python tools/bench_scale.py [--scales 1x,10x] [--out BENCH_SCALE.json]
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
    # round 12: the auto-checkpoint cutover boundary — just above
    # PF_SINGLE_DAG_MAX_DOCS = 1M docs (tools/gen_scale_corpus.py
    # --mults=200), proving the self-contained q259 survives where the
    # round-11 single-DAG form died on disk
    "200x": os.path.join(ROOT, "bigdata", "gen200x"),
    # round 6: a further decade for the cheapest-per-row dedup family
    # (documents + embeddings only — tools/gen_scale_corpus.py --mults=1000)
    "1000x": os.path.join(ROOT, "bigdata", "gen1000x"),
}
# Rows (documents+planted, embeddings, events) per scale — for
# rows-per-second context in the report.
N_DOCS = {
    "1x": 5_210, "10x": 52_100, "100x": 521_000,
    "200x": 1_042_000, "1000x": 5_210_000,
}

# Queries executed at 100x: the families whose scale behavior the design
# claims hinge on (dedup ladder, CC, ANN, surprisal/LM, batched
# grouped-map, novelty, containment, curation composition).
MARQUEE_100X = {
    "q20_dedup_exact", "q22_minhash_lsh_candidates", "q24_lang_id",
    "q25_text_quality", "q28_bloom_prefilter_dedup", "q30_ann_bruteforce",
    "q31_ann_ivf", "q52_ann_ivf_nprobe", "q59_lsh_bucket_stats",
    "q60_neardup_components", "q62_ann_quantized", "q63_benchmark_decontamination",
    "q64_ann_ivf_quantized", "q66_embedding_neardup_components",
    "q74_semantic_neardup", "q80_incremental_dedup", "q83_user_gap_stats_batched",
    "q85_passage_duplication", "q86_minhash_jaccard_estimate",
    "q88_unigram_surprisal", "q91_quality_gate", "q105_bigram_doc_score",
    "q117_component_size_histogram", "q121_ngram_novelty",
    "q126_containment_pairs", "q142_ab_uplift", "q153_component_keyed_split",
    "q155_component_reuse_rollup", "q158_dsir_importance_weights",
    "q159_perceptual_hash_twins", "q161_source_overlap_sketch",
    "q162_longest_common_span",
    # wave 2: edit-distance verify (prefix-capped DP over candidates),
    # iterative integer pagerank, basket pair join, salted skyline,
    # layout audit, two-level Zipf head
    "q163_edit_distance_verify", "q164_pagerank_neardup",
    "q165_market_basket", "q166_pareto_frontier", "q167_zorder_layout",
    "q168_zipf_slope", "q169_incremental_rollup", "q170_interval_union",
    "q171_semi_additive_snapshot", "q172_triangle_count",
    "q173_distribution_drift_psi", "q174_label_consistency_audit",
    # wave 3/4: PIT interleave, segment NTILE, lag matrix, survivor EWMA,
    # attribution ranks, dual brute-force top-K, decorrelated Q17,
    # cohort triangle, LOCF grid explode, recursive DAG walk
    "q175_point_in_time_join", "q176_rfm_segmentation",
    "q177_markov_transitions", "q178_functional_dependency_audit",
    "q179_ewma_features", "q180_multitouch_attribution",
    "q181_matryoshka_recall", "q182_small_quantity_revenue",
    "q183_top_supplier", "q184_cohort_revenue_triangle",
    "q185_balance_carry_forward", "q186_gtest_independence",
    "q187_benford_audit", "q188_neardup_chain_depth",
    # wave 5: recursive CUSUM walk, 2x2 G-test, integer OLS slopes
    "q189_cusum_changepoint", "q190_ab_significance", "q191_trend_slopes",
    # wave 6: exact correlation screen, regex readability scan
    "q192_value_hour_correlation", "q193_readability",
    # wave 7: fused contract scans, l-diversity window
    "q194_data_contract_audit", "q195_l_diversity",
    # wave 8: bounded-memory frequency sketch + exact verify
    "q197_countmin_heavy_hitters", "q198_revenue_concentration",
    # round 6: the part-dependent trio (gen corpora carry part now)
    "q196_weighted_median",
    # round 6: from-materialized graph twins — the ladder paid once
    "q199_pagerank_materialized", "q200_triangles_materialized",
    "q201_chain_depth_materialized",
    # round 6 wave: Gram/PCA, winnowing, prefix-filter join, systematic
    # resample, kappa, k-core, assortativity
    "q202_embedding_gram", "q203_pca_power_iteration",
    "q204_winnowing_fingerprints",
    # q205 runs at 1x/10x only: the exact all-pairs join's candidate
    # volume grows super-linearly on a fixed trigram space (exactness
    # has an inherent price — the capped LSH ladder q22->q21 is the
    # at-scale path; see q205's doc and BASELINE.md)
    "q206_systematic_resample", "q207_lang_id_kappa",
    "q208_kcore_decomposition", "q209_degree_assortativity",
    # round 6 second wave: rank eval, AA linkpred, backoff LM, HLL,
    # OLS, MASE, Zipf
    "q210_ann_rank_eval", "q211_adamic_adar_linkpred",
    "q212_trigram_backoff_lm", "q213_hll_distinct_sketch",
    "q214_ols_normal_equations", "q215_seasonal_naive_mase",
    "q216_zipf_exponent_fit",
    # round 6 third wave: effective rank, calibration, KMV algebra,
    # re-delivery dedup, HLL merge identity
    "q217_embedding_effective_rank", "q218_langid_calibration",
    "q219_kmv_cardinality_algebra", "q220_event_redelivery_dedup",
    "q221_hll_merge_identity",
    # round 6 fourth wave: boilerplate segments, mixture KL, survivor
    # policy, vocab coverage
    "q222_segment_boilerplate", "q223_mixture_kl_drift",
    "q224_survivor_policy_dedup", "q225_vocab_coverage_curve",
    # round 6 fifth wave: rank-sum AUC, LOO target encoding, t-closeness,
    # MI feature screen, one-step LPA (ladder consumer), conformal
    "q226_roc_auc", "q227_target_encoding_loo", "q228_t_closeness",
    "q229_mi_feature_screen", "q230_label_propagation",
    "q231_conformal_thresholds",
    # round 6 sixth wave: one-scan Poisson bootstrap, centroid
    # silhouette, partition modularity (ladder consumer), histogram-CDF
    # curriculum staging
    "q232_poisson_bootstrap_se", "q233_simplified_silhouette",
    "q234_modularity_score", "q235_curriculum_buckets",
    # round 6 seventh wave: bucket-CDF KS drift, budgeted curation cut
    "q236_ks_drift_test", "q237_token_budget_selection",
    # round 7: A-ES weighted reservoir, RAG chunker, mergeable
    # histogram quantiles
    "q238_weighted_reservoir_sample", "q239_rag_chunks",
    "q240_histogram_quantile_merge",
    # round 8: deterministic KLL sketch, second-stage rerank eval,
    # per-doc char entropy
    "q241_kll_quantile_sketch", "q242_crossencoder_rerank_eval",
    "q243_char_entropy",
    # round 9: exact substring spans, DSIR resample
    "q244_exact_substring_spans", "q245_dsir_importance_resample",
    # round 10/11: capped prefix pairs + report, BPE trainer/encode,
    # quality classifier, MRR, materialized twins, PNG decode, unigram EM
    "q157_incremental_components",
    "q256_bpe_merge_trainer", "q257_fasttext_quality_score", "q258_mrr_eval",
    "q261_bpe_encode_report",
    "q259_prefix_pairs_capped",
    "q260_prefix_posting_report",
    "q262_incremental_components_materialized",
    "q263_prefix_pairs_materialized", "q264_prefix_report_materialized",
    "q265_png_decode_features", "q266_unigram_lm_em_step",
    # round 12: ExactSubstr family (q267 string-keyed judge, q269
    # int64-keyed production twin), embedding-CC materialized twin,
    # JPEG decode
    "q267_exactsubstr_coverage", "q268_exactsubstr_runs",
    "q269_exactsubstr_hashed_coverage", "q270_exactsubstr_freq_report",
    "q271_embedding_components_materialized", "q272_jpeg_decode_features",
}


def main() -> None:
    scales = ["1x", "10x", "100x"]
    out_path = os.path.join(ROOT, "BENCH_SCALE.json")
    args = sys.argv[1:]
    if "--scales" in args:
        scales = args[args.index("--scales") + 1].split(",")
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    all_100x = "--all-100x" in args  # run every runnable query at 100x
    skip = set()
    if "--skip" in args:
        skip = set(args[args.index("--skip") + 1].split(","))
    only: set[str] | None = None  # restrict the whole run to these queries
    if "--only" in args:
        only = set(args[args.index("--only") + 1].split(","))

    from retail_sales_etl_pipeline_spark.plans.registry import load_all
    from retail_sales_etl_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = get_spark(
        "bench-scale", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    def cleanup() -> None:
        spark.catalog.clearCache()
        for rdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            rdd.unpersist()

    results: dict[str, dict] = {}
    skipped: dict[str, str] = {}

    def flush() -> None:
        doc = {
            "metric": "scale_run",
            # in-record timestamp: scale_index.py orders re-measured
            # decades by this, never by file mtime (which git checkout
            # does not preserve — round-10 advice)
            "recorded_at": int(time.time()),
            "scales": {s: SCALE_DIRS[s] for s in scales},
            "n_docs": N_DOCS,
            "queries": results,
            "skipped": skipped,
        }
        # scaling factors where both endpoints exist (times only — the
        # q59_cap_report entry holds row dicts, not seconds)
        for name, row in results.items():
            a, b, c = row.get("1x"), row.get("10x"), row.get("100x")
            d = row.get("1000x")
            if isinstance(a, (int, float)) and isinstance(b, (int, float)) and a:
                row["r10"] = round(b / a, 2)
            if isinstance(b, (int, float)) and isinstance(c, (int, float)) and b:
                row["r100"] = round(c / b, 2)
            if isinstance(c, (int, float)) and isinstance(d, (int, float)) and c:
                row["r1000"] = round(d / c, 2)
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.write("\n")

    # JVM/codegen warm-up (untimed)
    warm = registry["q20_dedup_exact"]
    warm.spark_fn(spark, SCALE_DIRS[scales[0]]).write.format("noop").mode(
        "overwrite"
    ).save()
    cleanup()

    for scale in scales:
        sf_dir = SCALE_DIRS[scale]
        for name in sorted(registry):
            if name in skipped or name in skip:
                continue
            if only is not None and name not in only:
                continue
            if scale == "100x" and not all_100x and name not in MARQUEE_100X:
                continue
            q = registry[name]
            t0 = time.time()
            try:
                q.spark_fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # noqa: BLE001
                msg = str(e).splitlines()[0][:160]
                if scale == scales[0] and (
                    "PATH_NOT_FOUND" in msg or "UNRESOLVED" in msg
                ):
                    # needs retail tables the gen corpora don't carry
                    skipped[name] = "needs-retail-tables"
                else:
                    skipped[name] = f"{scale}: {msg}"
                print(f"SKIP {name} @{scale}: {skipped[name]}",
                      file=sys.stderr, flush=True)
                cleanup()
                flush()
                continue
            dt = round(time.time() - t0, 3)
            results.setdefault(name, {})[scale] = dt
            print(f"{name} @{scale}: {dt}s", file=sys.stderr, flush=True)
            cleanup()
            flush()

        if only is not None and "q59_lsh_bucket_stats" not in only:
            # focused re-measurement run: the driver + cap-report
            # context rows are already in the main record
            continue
        if only is not None:
            # focused run that asked for the cap report (e.g. the 1000x
            # decade): record q59's bucket rows, skip the curation driver
            try:
                rows = [
                    r.asDict()
                    for r in registry["q59_lsh_bucket_stats"]
                    .spark_fn(spark, sf_dir)
                    .collect()
                ]
                results.setdefault("q59_cap_report", {})[scale] = rows
            except Exception as e:  # noqa: BLE001
                results.setdefault("q59_cap_report", {})[scale] = str(e)[:200]
            cleanup()
            flush()
            continue

        # curation driver end-to-end at each scale (materialized stages)
        import shutil
        import tempfile

        from retail_sales_etl_pipeline_spark.plans import curation_pipeline

        out_dir = tempfile.mkdtemp(prefix=f"curation_{scale}_")
        t0 = time.time()
        curation_pipeline.run(spark, sf_dir, out_dir)
        dt = round(time.time() - t0, 3)
        results.setdefault("curation_driver_run", {})[scale] = dt
        print(f"curation_driver_run @{scale}: {dt}s", file=sys.stderr,
              flush=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        cleanup()
        flush()

        # LSH cap observability: record q59's bucket report rows — the
        # caps must BITE at scale, visibly, not silently
        try:
            rows = [
                r.asDict()
                for r in registry["q59_lsh_bucket_stats"]
                .spark_fn(spark, sf_dir)
                .collect()
            ]
            results.setdefault("q59_cap_report", {})[scale] = rows
        except Exception as e:  # noqa: BLE001
            results.setdefault("q59_cap_report", {})[scale] = str(e)[:200]
        cleanup()
        flush()

    flush()
    print(json.dumps({"metric": "scale_run_done", "out": out_path,
                      "n_queries": len(results),
                      "n_skipped": len(skipped)}))


if __name__ == "__main__":
    main()
