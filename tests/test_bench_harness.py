"""bench.py fault isolation: one throwing query must not abort the run.

Round 6 lost its entire official bench record (BENCH_r06.json rc:1,
parsed:null) because a single query's int64 overflow aborted the 235-query
loop before any summary line printed. `run_queries` now isolates each
query: a failure becomes an {"err": ...} row and every other query still
gets its timing — the record degrades, it never dies.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from tests.conftest import SMOKE_SF_DIR  # noqa: E402


class _Q:
    def __init__(self, fn):
        self.spark_fn = fn
        self.tags = ()


def test_broken_query_yields_err_row_and_full_record(spark):
    from retail_sales_etl_pipeline_spark.plans import parity_queries as pq

    def boom(spark, sf_dir):
        # Throws at EXECUTION time (like q214's ANSI overflow did), not at
        # plan-build time — the harder case for the harness.
        return spark.range(10).selectExpr(
            "CAST(9223372036854775807 AS BIGINT) + id AS kaboom"
        )

    registry = {
        "q01_clean_filters": _Q(pq.q01_clean_filters),
        "q_broken_overflow": _Q(boom),
        "q07_agg_counts": _Q(pq.q07_agg_counts),
    }
    timings, errors = bench.run_queries(
        spark, registry, sf_dir=SMOKE_SF_DIR, repeats=1
    )
    # the broken query is an error row; BOTH healthy queries still timed
    assert set(errors) == {"q_broken_overflow"}
    assert set(timings) == {"q01_clean_filters", "q07_agg_counts"}
    assert all(t >= 0 for t in timings.values())
    # the error message is a single bounded line (fits the JSON record)
    assert "\n" not in errors["q_broken_overflow"]
    assert len(errors["q_broken_overflow"]) <= 200


def test_plan_build_failure_also_isolated(spark):
    def bad_plan(spark, sf_dir):
        raise ValueError("plan construction exploded")

    def ok(spark, sf_dir):
        return spark.range(5).selectExpr("id")

    timings, errors = bench.run_queries(
        spark,
        {"q_bad": _Q(bad_plan), "q_ok": _Q(ok)},
        sf_dir=SMOKE_SF_DIR,
        repeats=1,
    )
    assert set(errors) == {"q_bad"}
    assert "plan construction exploded" in errors["q_bad"]
    assert set(timings) == {"q_ok"}


def test_final_summary_line_is_capture_window_safe():
    """The driver's tail-capture window is ~2,000 chars; rounds 3, 5 and
    7 each lost (or truncated) their bench record when the summary line
    grew with the registry. The final line is now registry-size-
    INDEPENDENT: same length at 240 queries or 10,000."""
    import json

    line = bench.final_summary_line(12345.678, 240, 3, 0.1, 1.234, 1.456)
    big = bench.final_summary_line(99999999.999, 10_000, 9_999, 0.1, 999.999, 999.999)
    assert len(line) < 400 and len(big) < 400
    parsed = json.loads(line)
    assert parsed["queries"] == {}  # intentionally absent, never clipped
    assert parsed["value"] == 12345.678
    assert parsed["n_queries"] == 240
    # calibration probe seconds travel in the summary line itself
    assert parsed["cal_s"] == [1.234, 1.456]
    # detail file is role-specific: driver runs (the default) must never
    # clobber the builder's committed BENCH_LOCAL.json (round-8 collision)
    assert parsed["detail"] == bench.DETAIL_FILE
    assert bench.DETAIL_FILE in ("BENCH_LOCAL.json", "BENCH_DRIVER_LATEST.json")


def test_per_query_chunk_lines_bounded_and_complete():
    """Round-12 verdict item 2: the per-query stdout map must reach the
    driver in lines that can never outgrow its ~2,000-char tail window.
    Each chunk line is bounded, the union of chunks is the complete map,
    and no chunk can be mistaken for the headline record."""
    import json

    short = {f"q{i:03d}": round(i * 0.123, 3) for i in range(300)}
    lines = bench.per_query_chunk_lines(short)
    assert len(lines) >= 2  # 300 entries cannot fit one bounded line
    merged: dict[str, float] = {}
    for i, line in enumerate(lines, 1):
        assert len(line) <= bench.PER_QUERY_CHUNK_BYTES
        parsed = json.loads(line)
        # not the headline metric, no "value": a last-line parser cannot
        # mistake a partial map for the complete record
        assert parsed["metric"] == "registry_queries_per_query_part"
        assert "value" not in parsed
        assert parsed["part"] == i and parsed["parts"] == len(lines)
        assert parsed["n_in_part"] == len(parsed["queries"])
        merged.update(parsed["queries"])
    assert merged == short

    # tiny registries still produce exactly one complete chunk
    one = bench.per_query_chunk_lines({"q01": 0.5})
    assert len(one) == 1 and json.loads(one[0])["queries"] == {"q01": 0.5}
    # the final summary line advertises the chunk count and stays bounded
    line = bench.final_summary_line(1.0, 300, 0, 0.1, 0.1, 0.1, parts=len(lines))
    assert len(line) < 400
    assert json.loads(line)["per_query_parts"] == len(lines)


def test_detail_file_role_separation(monkeypatch):
    """Driver-role (default) and builder-role runs write DIFFERENT files."""
    import importlib

    monkeypatch.delenv("SPARK_GRAFT_BENCH_ROLE", raising=False)
    importlib.reload(bench)
    assert bench.DETAIL_FILE == "BENCH_DRIVER_LATEST.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROLE", "builder")
    importlib.reload(bench)
    assert bench.DETAIL_FILE == "BENCH_LOCAL.json"
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ROLE", raising=False)
    importlib.reload(bench)


def test_outlier_rerun_rule(spark):
    """Round-10 verdict #3: a reading >2x the previous committed record
    gets one in-run re-measure; both readings recorded, lower used."""

    def ok(spark, sf_dir):
        return spark.range(5).selectExpr("id")

    reruns: dict[str, list[float]] = {}
    timings, errors = bench.run_queries(
        spark,
        {"q_fast": _Q(ok)},
        sf_dir=SMOKE_SF_DIR,
        repeats=1,
        # previous record claims this query takes ~0s, so ANY real
        # reading is an outlier -> the re-run path must trigger
        prev={"q_fast": 1e-9},
        reruns=reruns,
    )
    assert not errors
    assert "q_fast" in timings
    assert list(reruns) == ["q_fast"]
    first, second = reruns["q_fast"]
    assert timings["q_fast"] == round(min(first, second), 3)

    # no previous record -> no re-run
    reruns2: dict[str, list[float]] = {}
    bench.run_queries(
        spark, {"q_fast": _Q(ok)}, sf_dir=SMOKE_SF_DIR, repeats=1,
        prev={}, reruns=reruns2,
    )
    assert reruns2 == {}


def test_load_prev_timings_shape():
    prev = bench.load_prev_timings()
    # committed canonical record exists in this repo; values numeric
    assert prev and all(
        isinstance(v, (int, float)) for v in prev.values()
    )
