"""One-command, judge-reproducible round verification.

Reproduces the round record in a single step (the three gates that were
previously separate invocations):

1. registry completeness + union gate over the round's correctness
   reports (driver record first, committed self-run as fallback) —
   ``check_correctness.py --verify-report``;
2. a SEEDED random spot-check: N oracle-backed queries re-executed live,
   Spark vs DuckDB, hash-compared (the same independent re-run the
   round-5 judge performed by hand — seeded so any session reproduces
   the identical sample);
3. a registry/entry-point consistency probe: every ``queries()`` name in
   ``__spark_entry__`` maps onto the registry and vice versa.

Usage:
    python tools/verify_round.py --round 6 \
        [--reports CORRECTNESS_r06.json CORRECTNESS_SELF_r6.json] \
        [--seed 6] [--spot 12] [--out VERIFY_r6.txt]

Defaults: reports = CORRECTNESS_r{NN}.json (if present) then
CORRECTNESS_SELF_r{N}.json (if present); seed = round; spot = 12; out =
VERIFY_r{N}.txt. Exit 0 == every gate green. The full pytest suite and
the full-registry oracle run stay separate (they are 15+ min); this
command verifies the committed ROUND RECORD and samples the live engine.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import random
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _git_ts(path: str) -> int | None:
    """Unix timestamp of the last commit touching ``path`` (None if the
    path has never been committed)."""
    proc = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", path],
        cwd=ROOT, capture_output=True, text=True, check=False,
    )
    out = proc.stdout.strip()
    return int(out) if proc.returncode == 0 and out else None


def _is_dirty(path: str) -> bool:
    """True when ``path`` has uncommitted modifications or is untracked —
    i.e. its on-disk content is NEWER than any commit."""
    proc = subprocess.run(
        ["git", "status", "--porcelain", "--", path],
        cwd=ROOT, capture_output=True, text=True, check=False,
    )
    return bool(proc.stdout.strip())


def newest_source_commit_ts() -> int | None:
    """Timestamp of the newest commit touching the engine source — the
    reference point every round record must postdate."""
    return _git_ts("retail_sales_etl_pipeline_spark")


def record_effective_ts(path: str) -> int | None:
    """When the record's content was produced. Preference order: an
    in-record self-stamp (_meta.recorded_at / recorded_at — survives the
    byte-identical-re-cut case where git sees the file as unchanged, hit
    in round 11), then file mtime for dirty/untracked files, then the
    last commit time. None if the file doesn't exist."""
    full = os.path.join(ROOT, path)
    if not os.path.exists(full):
        return None
    if path.endswith(".json"):
        try:
            doc = json.load(open(full))
            ts = (doc.get("_meta") or {}).get("recorded_at") or doc.get(
                "recorded_at"
            )
            if isinstance(ts, (int, float)) and ts > 0:
                return int(ts)
        except Exception:  # noqa: BLE001 — unreadable JSON falls through to git/mtime
            pass
    if _is_dirty(path):
        return int(os.path.getmtime(full))
    ts = _git_ts(path)
    return ts if ts is not None else int(os.path.getmtime(full))


def freshness_problems(
    record_ts: dict[str, int | None], source_ts: int | None
) -> list[str]:
    """Pure comparison core (unit-testable without git): a record is
    STALE when it is missing or strictly predates the newest source
    commit. Rounds 9 and 10 each shipped a post-record code change
    (q255, q246) that the stress/verify records never saw — this gate
    makes the 're-cut after the last change' ritual mechanical."""
    if source_ts is None:
        return []  # no committed source yet — nothing to compare against
    problems = []
    for name, ts in record_ts.items():
        if ts is None:
            problems.append(f"{name}: missing — cut it after the last "
                            "source commit")
        elif ts < source_ts:
            problems.append(
                f"{name}: STALE — record time {ts} predates the newest "
                f"source commit {source_ts}; re-cut it"
            )
    return problems


def run_step(title: str, cmd: list[str], log: io.StringIO) -> int:
    print(f"\n=== {title} ===\n$ {' '.join(cmd)}", flush=True)
    log.write(f"\n=== {title} ===\n$ {' '.join(cmd)}\n")
    proc = subprocess.run(
        cmd, cwd=ROOT, capture_output=True, text=True, check=False
    )
    out = proc.stdout + proc.stderr
    # keep the log reviewable: head+tail if a step is very chatty
    lines = out.splitlines()
    if len(lines) > 260:
        out = "\n".join(lines[:30] + [f"... [{len(lines) - 60} lines] ..."]
                        + lines[-30:])
    print(out, flush=True)
    log.write(out + f"\nexit={proc.returncode}\n")
    return proc.returncode


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--reports", nargs="*", default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--spot", type=int, default=12)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    seed = args.seed if args.seed is not None else args.round
    out_path = args.out or os.path.join(ROOT, f"VERIFY_r{args.round}.txt")

    reports = args.reports
    if reports is None:
        reports = []
        for cand in (f"CORRECTNESS_r{args.round:02d}.json",
                     f"CORRECTNESS_SELF_r{args.round}.json"):
            if os.path.exists(os.path.join(ROOT, cand)):
                reports.append(cand)
    if not reports:
        print("no correctness reports found — run "
              "check_correctness.py --emit-json first")
        return 2

    from retail_sales_etl_pipeline_spark.plans.registry import load_all

    registry = load_all()
    log = io.StringIO()
    header = (
        f"verify_round: round={args.round} seed={seed} spot={args.spot}\n"
        f"registry: {len(registry)} queries\n"
        f"reports: {', '.join(reports)}\n"
    )
    print(header)
    log.write(header)
    rc = 0

    # gate 0: record freshness — every round record must postdate the
    # newest commit touching the engine source (VERIFY itself is fresh
    # by construction: this run writes it last)
    src_ts = newest_source_commit_ts()
    gate0_records = {
        f"CORRECTNESS_SELF_r{args.round}.json": record_effective_ts(
            f"CORRECTNESS_SELF_r{args.round}.json"
        ),
        f"STRESS_r{args.round}.json": record_effective_ts(
            f"STRESS_r{args.round}.json"
        ),
    }
    stale = freshness_problems(gate0_records, src_ts)
    msg0 = ("\n=== gate 0: record freshness vs newest source commit ===\n"
            + (f"source ts {src_ts}; " if src_ts else "no source commits; ")
            + (("\n".join(stale)) if stale else
               "all round records postdate the newest source commit")
            + "\n")
    print(msg0)
    log.write(msg0)
    if stale:
        rc |= 1

    # gate 1: completeness + union over the round's reports
    rc |= run_step(
        "gate 1: registry completeness + report union",
        [sys.executable, "tools/check_correctness.py", "--verify-report",
         *reports],
        log,
    )

    # gate 2: seeded live spot-check of oracle-backed queries
    oracle_backed = sorted(n for n, q in registry.items()
                           if q.oracle is not None)
    sample = random.Random(seed).sample(
        oracle_backed, min(args.spot, len(oracle_backed))
    )
    log.write(f"\nspot sample (seed={seed}): {', '.join(sample)}\n")
    print(f"spot sample (seed={seed}): {', '.join(sample)}")
    rc |= run_step(
        f"gate 2: live spot-check of {len(sample)} queries vs DuckDB",
        [sys.executable, "tools/check_correctness.py", *sample],
        log,
    )

    # gate 3: entry-point surface == registry
    import __spark_entry__ as entry  # noqa: PLC0415

    q_names = set(entry.queries())
    o_names = set(entry.oracle_sql())
    reg_names = set(registry)
    problems = []
    if q_names != reg_names:
        problems.append(
            f"queries() != registry: only-entry={sorted(q_names - reg_names)}"
            f" only-registry={sorted(reg_names - q_names)}"
        )
    if not o_names <= q_names:
        problems.append(
            f"oracle_sql() has unknown names: {sorted(o_names - q_names)}"
        )
    expect_oracle = {n for n in reg_names if registry[n].oracle is not None}
    if o_names != expect_oracle:
        problems.append(
            f"oracle_sql() coverage mismatch: missing="
            f"{sorted(expect_oracle - o_names)} extra="
            f"{sorted(o_names - expect_oracle)}"
        )
    msg = ("\n=== gate 3: __spark_entry__ surface ===\n"
           + ("\n".join(problems) if problems else
              f"queries()={len(q_names)} oracle_sql()={len(o_names)} "
              "— consistent with registry") + "\n")
    print(msg)
    log.write(msg)
    if problems:
        rc |= 1

    verdict = "GREEN" if rc == 0 else "RED"
    tail = f"\nverify_round: {verdict}\n"
    print(tail)
    log.write(tail)
    with open(out_path, "w") as f:
        f.write(log.getvalue())
    print(f"wrote {out_path}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
