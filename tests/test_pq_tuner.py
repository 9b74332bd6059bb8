"""Value-level properties of q246 (PQ ADC top-k) and q247 (LSH tuner).

Hash parity vs the DuckDB oracle is the driver's job; these tests pin the
SEMANTIC claims the docs make: PQ beats chance by a wide margin despite
32x compression, codes live in the codebook range, and the tuner's
S-curve behaves monotonically the way the math says it must.
"""

from __future__ import annotations

import pytest

from retail_sales_etl_pipeline_spark.plans.registry import load_all

from .conftest import SMOKE_SF_DIR

REGISTRY = load_all()


@pytest.fixture(scope="module")
def tuner_rows(spark):
    df = REGISTRY["q247_lsh_param_tuner"].spark_fn(spark, SMOKE_SF_DIR)
    return [r.asDict() for r in df.collect()]


def test_pq_adc_recall_beats_chance(spark):
    """Top-10 ADC recall vs exact q30 cosine top-10. With a 16-entry
    codebook per subspace (256 bytes -> 8 codes) recall is ~0.34 on the
    test embeddings; random top-10 of a ~600-vector corpus is ~0.017.
    Pin a wide margin, not the exact value (corpus-size dependent)."""
    exact = REGISTRY["q30_ann_bruteforce"].spark_fn(spark, SMOKE_SF_DIR).collect()
    approx = REGISTRY["q246_pq_adc_topk"].spark_fn(spark, SMOKE_SF_DIR).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(ex) == set(ap)  # same query set, all with 10 rows
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_pq_adc_output_shape(spark):
    rows = REGISTRY["q246_pq_adc_topk"].spark_fn(spark, SMOKE_SF_DIR).collect()
    per_q = {}
    for r in rows:
        assert r.adc_dist >= 0.0
        assert r.neighbor_id != r.query_id
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, 11)), (q, ranks)


def test_tuner_contains_deployed_config(tuner_rows):
    """The deployed q22 banding (16 perms, 4 bands x 4 rows) must be one
    of the evaluated cells, so the report directly grades production."""
    assert any(
        r["n_perms"] == 16 and r["bands"] == 4 and r["rows_per_band"] == 4
        for r in tuner_rows
    )


def test_tuner_scurve_monotone(tuner_rows):
    """For a fixed permutation budget, raising rows-per-band makes every
    band stricter: both expected recall and expected false-positive mass
    must be non-increasing in r. (Truncating fixed-point keeps this exact
    monotonicity: x -> (x*x) div 1e6 is monotone on [0, 1e6].)"""
    for budget in (16, 128):
        cells = sorted(
            (r for r in tuner_rows if r["n_perms"] == budget),
            key=lambda r: r["rows_per_band"],
        )
        assert len(cells) == budget.bit_length()
        for a, b in zip(cells, cells[1:]):
            assert a["exp_recall_ppm"] >= b["exp_recall_ppm"]
            assert a["exp_fp_ppm"] >= b["exp_fp_ppm"]


def test_tuner_r1_catches_everything(tuner_rows):
    """r=1 bands collide on ANY matching single hash: with b >= 16 bands
    the collide probability of a true near-dup (jacc >= 0.3) is
    1-(1-s)^16 ~ 0.997+ — the tuner must report (near-)total recall and
    the largest FP mass of its budget column."""
    for budget in (16, 128):
        col = [r for r in tuner_rows if r["n_perms"] == budget]
        r1 = next(r for r in col if r["rows_per_band"] == 1)
        assert r1["exp_recall_ppm"] >= 990_000
        assert r1["exp_fp_ppm"] == max(r["exp_fp_ppm"] for r in col)
