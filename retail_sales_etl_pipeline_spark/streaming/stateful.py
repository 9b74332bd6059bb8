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
