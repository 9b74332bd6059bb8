"""Stage-level timeout + bounded-retry policy for the pipeline drivers.

The reference bounds every orchestrated stage (dag1_ingest_csv.py:20-22
``execution_timeout=timedelta(minutes=15)``, ``retries=2``;
dag_master_pipeline.py:20 same knobs on the master DAG): a stage that
hangs is killed, a stage that fails transiently is retried a bounded
number of times, and every attempt is an observable record. This module
is the Spark-native form of that contract:

- TIMEOUT via Spark job groups: each attempt runs under its own job
  group with ``interruptOnCancel``; a watchdog timer calls
  ``cancelJobGroup`` at the deadline, which aborts the attempt's Spark
  jobs cluster-wide (the same mechanism the Spark UI's kill button
  uses). This cancels real distributed work — not just a driver-side
  alarm that leaves executors grinding.
- RETRY by re-invoking the stage thunk up to ``retries`` more times.
  Stage thunks must be idempotent — every driver stage here is either a
  pure computation or an overwrite-mode write, so a replay is safe
  (same property a 1000-executor deployment needs anyway, since Spark
  itself replays lost tasks).
- OBSERVABILITY: every attempt becomes a ``StageAttempt`` row (status
  ``success`` / ``timeout`` / ``failed``, wall seconds, attempt index)
  that drivers append to the same metrics sink as their row-count
  StageMetrics — a hung or flaky 100 TB stage shows up as numbered
  rows, never as a silent stall.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Callable, TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")

# Reference defaults: dag1_ingest_csv.py:20-22 (15-minute execution
# timeout, 2 retries).
DEFAULT_TIMEOUT_S = 15 * 60
DEFAULT_RETRIES = 2


@dataclass(frozen=True)
class StagePolicy:
    timeout_s: float = DEFAULT_TIMEOUT_S
    retries: int = DEFAULT_RETRIES


@dataclass(frozen=True)
class StageAttempt:
    stage_name: str
    attempt: int  # 1-based
    status: str  # success | timeout | failed
    seconds: float
    error: str = ""


class StageFailure(RuntimeError):
    """All attempts exhausted; carries the full attempt history."""

    def __init__(self, stage_name: str, attempts: list[StageAttempt]):
        self.stage_name = stage_name
        self.attempts = attempts
        last = attempts[-1]
        super().__init__(
            f"stage {stage_name!r} failed after {len(attempts)} attempts "
            f"(last: {last.status}: {last.error})"
        )


def run_stage(
    spark: SparkSession,
    name: str,
    thunk: Callable[[], T],
    policy: StagePolicy = StagePolicy(),
    attempts_out: list[StageAttempt] | None = None,
) -> T:
    """Run ``thunk`` under ``policy``, recording every attempt.

    Returns the thunk's value on the first successful attempt; raises
    ``StageFailure`` (with history) once 1 + retries attempts are spent.
    Attempt rows are appended to ``attempts_out`` as they happen, so a
    driver's metrics log is complete even when the failure propagates.
    """
    attempts: list[StageAttempt] = (
        attempts_out if attempts_out is not None else []
    )
    sc = spark.sparkContext
    for attempt in range(1, policy.retries + 2):
        group = f"stage:{name}:a{attempt}"
        timed_out = threading.Event()

        def _cancel() -> None:
            timed_out.set()
            sc.cancelJobGroup(group)

        watchdog = threading.Timer(policy.timeout_s, _cancel)
        watchdog.daemon = True
        sc.setJobGroup(group, f"{name} (attempt {attempt})",
                       interruptOnCancel=True)
        watchdog.start()
        t0 = time.time()
        try:
            result = thunk()
        except Exception as e:  # noqa: BLE001
            status = "timeout" if timed_out.is_set() else "failed"
            attempts.append(
                StageAttempt(name, attempt, status,
                             round(time.time() - t0, 3),
                             str(e).splitlines()[0][:200])
            )
            continue
        finally:
            watchdog.cancel()
            sc.setJobGroup("", "")
        if timed_out.is_set():
            # the cancel landed between the last job finishing and the
            # thunk returning — the deadline was still blown
            attempts.append(
                StageAttempt(name, attempt, "timeout",
                             round(time.time() - t0, 3), "deadline exceeded")
            )
            continue
        attempts.append(
            StageAttempt(name, attempt, "success",
                         round(time.time() - t0, 3))
        )
        return result
    raise StageFailure(name, attempts)
