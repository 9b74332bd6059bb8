"""Custom stateful streaming operator: per-user running aggregates.

Demonstrates the arbitrary-stateful-processing path
(``applyInPandasWithState``) that covers operators Spark's built-in
windows can't express: custom per-key state machines, running aggregates
with bespoke emission rules, cross-batch counters.

State here is one (count, value_sum) pair per user, updated per
micro-batch and emitted in update mode; at scale, state lives in the
state store (RocksDB-backed on clusters), partitioned by the grouping
key — the operator itself never sees more than one key's state at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, value_sum double"
STATE_SCHEMA = "n long, v double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum(value)) via custom state."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_sum": [v]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming interval union — the stateful twin of the batch q170
# (plans/event_queries.py): per-user running (n_islands, n_spans,
# covered_us) over variable-length spans, where an island closes only
# when a new span starts past the running max of ALL previous ends.
# State per user is FIVE int64s (closed-island count + covered total +
# the one open island + span count) — constant size regardless of
# stream length, the property that lets it run forever against a
# 100 TB/day event feed. Requires event-time-ordered arrival (the
# file-source twin test feeds time-ordered micro-batches; a production
# deployment puts a watermarked sort-within-trigger in front or
# tolerates the documented reordering error).
INTERVAL_OUTPUT_SCHEMA = (
    "user_id long, n_islands long, n_spans long, covered_us long"
)
INTERVAL_STATE_SCHEMA = (
    "closed_n long, closed_cov long, cur_s long, cur_e long, n_spans long"
)
INTERVAL_MAX_S = 600  # mirror of plans.event_queries.INTERVAL_MAX_S


def interval_union_running(events: DataFrame) -> DataFrame:
    """Streaming per-user interval union via custom state: emits the
    running (n_islands, n_spans, covered_us) after every micro-batch;
    the final emission equals the batch q170 row for the same data."""

    def update(key, pdfs, state: GroupState):
        closed_n, closed_cov, cur_s, cur_e, n_spans = (
            state.get if state.exists else (0, 0, -1, -1, 0)
        )
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = pd.concat(frames).sort_values(["ts", "event_id"])
            s_arr = pdf["ts"].astype("int64") // 1000  # ns -> us
            dur = (
                pdf["value"].clip(upper=INTERVAL_MAX_S) * 100
            ).round().astype("int64") * 10_000
            for s, d in zip(s_arr.tolist(), dur.tolist()):
                e = s + d
                n_spans += 1
                if cur_s < 0:
                    cur_s, cur_e = s, e
                elif s > cur_e:
                    closed_n += 1
                    closed_cov += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
        state.update((closed_n, closed_cov, cur_s, cur_e, n_spans))
        open_island = 1 if cur_s >= 0 else 0
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_islands": [closed_n + open_island],
                "n_spans": [n_spans],
                "covered_us": [
                    closed_cov + (cur_e - cur_s if open_island else 0)
                ],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=INTERVAL_OUTPUT_SCHEMA,
        stateStructType=INTERVAL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming fixed-point EWMA — the stateful twin of the batch q179
# (plans/event_queries.py): per-user EWMA over the last EWMA_K events
# with power-of-two weights, in pure integers. State per user is the
# last EWMA_K cent values (a fixed-width int64 array) — bounded
# regardless of stream length, and the emission is bit-equal to the
# batch query on the same prefix. Requires event-time-ordered arrival
# within each user (same contract as interval_union_running above).
EWMA_K = 16  # mirror of plans.event_queries.EWMA_K
EWMA_OUTPUT_SCHEMA = "user_id long, n_used long, ewma_micro long"
# state: fixed-width recent-cents window, most recent first
EWMA_STATE_SCHEMA = "recent array<long>"


def ewma_running(events: DataFrame) -> DataFrame:
    """Streaming per-user fixed-point EWMA: emits the running
    (n_used, ewma_micro) after every micro-batch; the final emission
    equals the batch q179 row for the same data."""

    def update(key, pdfs, state: GroupState):
        recent = list(state.get[0]) if state.exists else []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = pd.concat(frames).sort_values(["ts", "event_id"])
            # match the batch DECIMAL(18,2) cast exactly: Spark casts
            # double->decimal via the shortest decimal repr with
            # HALF_UP — pandas .round() is half-EVEN and differs on
            # .xx5 boundaries
            from decimal import ROUND_HALF_UP, Decimal

            cents = [
                int(
                    Decimal(repr(v)).quantize(
                        Decimal("0.01"), ROUND_HALF_UP
                    )
                    * 100
                )
                for v in pdf["value"].tolist()
            ]
            # most recent first, truncated to the fixed window
            recent = list(reversed(cents)) + recent
            recent = recent[:EWMA_K]
        state.update((recent,))
        num = sum(
            c * (1 << (EWMA_K - k)) for k, c in enumerate(recent, 1)
        )
        den = sum(1 << (EWMA_K - k) for k in range(1, len(recent) + 1))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_used": [len(recent)],
                "ewma_micro": [num * 10_000 // den if den else None],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
