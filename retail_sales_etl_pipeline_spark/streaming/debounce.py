"""Streaming kept-relative debounce: the stateful twin of the batch
lag-form debounce (plans/event_queries.q100_event_debounce).

Semantics difference, and why this op exists: the batch lag-form drops an
event when its gap to the previous RAW event is small — expressible as
one window function, fully parallel. The KEPT-relative form (drop when
within the window of the last SURVIVOR) is a per-key state machine: each
decision depends on the previous decision, so no fixed number of window
passes can express it. That is exactly the arbitrary-stateful-processing
case — ``applyInPandasWithState`` with one `last_kept_us` long per key.

Ordering contract: events are processed in (ts, event_id) order WITHIN a
micro-batch, and batches in arrival order — the standard at-ingest
debouncing assumption. Late (out-of-order) events across batches would
need watermark-held reordering upstream; at 100 TB state is one long per
key in the RocksDB state store, partitioned by user_id.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_id long, user_id long, ts_us long"
STATE_SCHEMA = "last_kept_us long"

DEBOUNCE_SECONDS = 600


def debounce_events(
    events: DataFrame, debounce_seconds: int = DEBOUNCE_SECONDS
) -> DataFrame:
    """Keep an event only if it is > ``debounce_seconds`` after the last
    KEPT event of the same user; survivors emitted in append mode."""
    gap_us = int(debounce_seconds) * 1_000_000

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        # self-contained: no module globals (workers may run with a
        # different cwd — see the verify skill's closure gotcha)
        import pandas as _pd

        last = int(state.get[0]) if state.exists else None
        parts = [p for p in pdfs if len(p)]
        rows: list[tuple[int, int, int]] = []
        if parts:
            pdf = _pd.concat(parts, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            ids = pdf["event_id"].to_numpy()
            for i in range(len(pdf)):
                if last is None or us[i] - last > gap_us:
                    rows.append((int(ids[i]), int(key[0]), int(us[i])))
                    last = int(us[i])
        if last is not None:
            state.update((last,))
        yield _pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us"])

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
