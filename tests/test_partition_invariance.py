"""Partition-count invariance: a distributed query's RESULT must not
depend on how many shuffle partitions execute it — the property that
order-dependent double sums, nondeterministic tiebreaks, and
first()-style aggregates silently violate, and the reason money goes
through decimals and tiebreaks are total orderings everywhere in this
engine. Representative order-sensitive shapes run under 3 and 32 shuffle
partitions and must match bit-for-bit.
"""

from __future__ import annotations

import pytest

from retail_sales_etl_pipeline_spark.plans.registry import load_all

from .conftest import SMOKE_SF_DIR

REGISTRY = load_all()

# the shapes where partitioning could plausibly leak into results:
# window-dedup tiebreaks, banded self-join aggs, iterative CC, floor-micros
# sums, running-sum packing, top-k with ties, decimal money, grouped-map
SENSITIVE = [
    "q02_dedup_rownumber",
    "q08_revenue_by_flag",
    "q22_minhash_lsh_candidates",
    "q30_ann_bruteforce",
    "q55_user_gap_stats",
    "q60_neardup_components",
    "q71_sliding_event_windows",
    "q77_sequence_packing",
    # round-4 additions with plausible order sensitivity: integer-division
    # micro-unit sums (q105), hash-threshold sampling (q106/q119), SCD2
    # run numbering (q107), salted split-merge (q108), path/pair top-k
    # tiebreaks (q113/q118), NTILE edges (q116), planted-probe recall
    # (q112), forward-frame labels (q115)
    "q105_bigram_doc_score",
    "q106_token_mass_sample",
    "q107_scd2_history",
    "q108_salted_skew_agg",
    "q112_lsh_recall_probe",
    "q113_session_paths",
    "q115_conversion_labels",
    "q116_quantile_binning",
    "q118_cooccurrence_pmi",
    "q119_min_k_group_sample",
    # later round-4 waves: data-dependent top-1 merge (q132), top-1 windows
    # joined (q135), top-k with stats broadcast (q143), day-grain running
    # sum (q148), rank/cume windows (q152), iterative CC + hash split (q153)
    "q132_bpe_second_merge",
    "q135_triplet_mining",
    "q143_join_key_skew",
    "q148_session_concurrency",
    "q152_balance_percentiles",
    "q153_component_keyed_split",
    # round-5 wave 2: iterative integer pagerank (q164), salted two-level
    # frontier prune (q166), two-level top-K head with tiebreaks (q168)
    "q164_pagerank_neardup",
    "q166_pareto_frontier",
    "q168_zipf_slope",
    # survivor-window + decimal merge shapes
    "q169_incremental_rollup",
    "q170_interval_union",
    "q171_semi_additive_snapshot",
    # triangle join + top-K label audit tiebreaks + decimal PSI products
    "q172_triangle_count",
    "q174_label_consistency_audit",
    # wave 3: PIT last_value interleave, NTILE quintiles, lag sequences,
    # survivor-window EWMA, attribution position ranks, dual top-K recall
    "q175_point_in_time_join",
    "q176_rfm_segmentation",
    "q177_markov_transitions",
    "q179_ewma_features",
    "q180_multitouch_attribution",
    "q181_matryoshka_recall",
    # wave 4: LOCF carry window + cohort distinct/decimal cells
    "q184_cohort_revenue_triangle",
    "q185_balance_carry_forward",
    # wave 5: recursive CUSUM walk, tiny-table G windows
    "q186_gtest_independence",
    "q189_cusum_changepoint",
    "q190_ab_significance",
    # wave 7: l-diversity dominant-band window, weighted-median cumsum
    "q195_l_diversity",
    "q196_weighted_median",
    "q198_revenue_concentration",
]


def _canon_rows(df):
    return sorted(tuple(str(v) for v in row) for row in df.collect())


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_shuffle_partitioning(spark, name):
    if name not in REGISTRY:  # guard against renames
        pytest.skip(f"{name} not registered")
    q = REGISTRY[name]
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        few = _canon_rows(q.spark_fn(spark, SMOKE_SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        many = _canon_rows(q.spark_fn(spark, SMOKE_SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert few == many, f"{name}: result depends on shuffle partitioning"
