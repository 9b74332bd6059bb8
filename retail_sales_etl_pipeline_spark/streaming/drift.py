"""Streaming distribution-drift monitor — the streaming twin of the
batch PSI query (plans/event_queries.q173_distribution_drift_psi).

Production shape: a reference bin distribution is computed ONCE from a
trusted window (batch job, small bins-sized table), broadcast to the
stream; the live stream maintains running per-bin counts with Spark's
built-in streaming aggregation (distributed, fault-tolerant state —
no custom stateful operator needed, which is the point: bin counting
is exactly the shape `groupBy().count()` already handles at any
scale), and each micro-batch emits the current total PSI via
``foreachBatch`` — a bins-sized reduction, regardless of stream rate.

The PSI arithmetic is the SAME micro-nat fixed point as q173 (ln only
on distinct integer counts, exact integer mass difference, one final
floor-division), so stream == batch is an integer equality, not a
tolerance check — asserted in tests/test_streaming_drift.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.event_queries import PSI_BIN_W, PSI_MAX_BIN

_L_MICRO = "CAST(FLOOR(ln(CAST({x} AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"


def bin_counts_stream(events: DataFrame) -> DataFrame:
    """Running per-bin counts of the live stream (q173's bin grid).

    Unbounded-but-tiny state: one count per bin (PSI_MAX_BIN+1 rows)
    however long the stream runs — complete output mode is safe.
    """
    return (
        events.selectExpr(
            f"LEAST({PSI_MAX_BIN}, CAST(floor(value / {PSI_BIN_W}D) AS INT))"
            " AS bin"
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def psi_against_reference(counts: DataFrame, reference: DataFrame) -> int | None:
    """Total micro-PSI of ``counts`` (bin, cnt) vs ``reference``
    (bin, cnt) — q173's exact fixed-point arithmetic, summed over bins
    observed on BOTH sides (one-sided bins contribute NULL in q173 and
    are excluded here the same way). Batch function: call it from
    ``foreachBatch`` on each micro-batch's running counts.

    Returns None when either side is empty.
    """
    ref = reference.select(
        F.col("bin").alias("bin"), F.col("cnt").alias("cnt_e")
    )
    cur = counts.select(F.col("bin").alias("bin"), F.col("cnt").alias("cnt_l"))
    joined = ref.join(cur, "bin")
    totals = (
        ref.agg(F.sum("cnt_e").cast("long").alias("ne"))
        .crossJoin(cur.agg(F.sum("cnt_l").cast("long").alias("nl")))
    )
    row = (
        joined.crossJoin(F.broadcast(totals))
        .selectExpr(
            f"""CASE WHEN cnt_e > 0 AND cnt_l > 0 THEN
              CAST(((CAST(cnt_e AS DECIMAL(38,0)) * nl
                     - CAST(cnt_l AS DECIMAL(38,0)) * ne)
                    * ({_L_MICRO.format(x="cnt_e")} + {_L_MICRO.format(x="nl")}
                       - {_L_MICRO.format(x="cnt_l")}
                       - {_L_MICRO.format(x="ne")}))
                   div (CAST(ne AS DECIMAL(38,0)) * nl) AS BIGINT)
            END AS contrib"""
        )
        .agg(F.sum("contrib").alias("psi_micro"))
        .collect()[0]
    )
    return row["psi_micro"]
