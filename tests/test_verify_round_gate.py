"""Gate 0 of tools/verify_round.py: round records must postdate the
newest commit touching the engine source. Rounds 9 and 10 each shipped a
post-record code change (q255, q246) that the stress/verify records never
saw — the freshness comparison is now mechanical, and this test fails it
on a simulated stale record."""

from __future__ import annotations

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "verify_round", os.path.join(ROOT, "tools", "verify_round.py")
)
vr = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vr)


def test_stale_record_fails():
    problems = vr.freshness_problems(
        {"STRESS_r11.json": 100, "CORRECTNESS_SELF_r11.json": 300},
        source_ts=200,
    )
    assert len(problems) == 1 and "STRESS_r11.json" in problems[0]
    assert "STALE" in problems[0]


def test_missing_record_fails():
    problems = vr.freshness_problems(
        {"STRESS_r11.json": None}, source_ts=200
    )
    assert len(problems) == 1 and "missing" in problems[0]


def test_fresh_records_pass():
    assert vr.freshness_problems(
        {"a.json": 200, "b.json": 999}, source_ts=200
    ) == []


def test_no_source_commits_is_vacuous():
    assert vr.freshness_problems({"a.json": None}, source_ts=None) == []


def test_git_plumbing_returns_timestamps():
    src = vr.newest_source_commit_ts()
    assert isinstance(src, int) and src > 1_500_000_000
    # a committed record resolves to an int; a nonexistent one to None
    assert vr.record_effective_ts("BENCH_r10.json") is not None
    assert vr.record_effective_ts("NO_SUCH_RECORD.json") is None
