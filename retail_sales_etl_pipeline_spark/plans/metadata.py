"""Run metadata: pipeline_runs / stage_metrics / recent_pipeline_runs
(reference scripts/metadata_tracker.py + schema/metadata_schema.sql).

Append-only parquet logs (M6). ``recent_pipeline_runs`` (the reference's
only VIEW, metadata_schema.sql:23-34) is the O1 top-k pattern:
ORDER BY ... DESC LIMIT 10 → Spark plans TakeOrderedAndProject.
"""

from __future__ import annotations

import time
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import PIPELINE_RUNS_SCHEMA, STAGE_METRICS_SCHEMA
from ..sources import fs


def log_pipeline_run(
    spark: SparkSession,
    path: str,
    pipeline_name: str,
    status: str,
    total_rows_processed: int,
    total_rows_loaded: int,
    duration_minutes: float,
    notes: str = "",
) -> int:
    """Append one pipeline_runs row (reference metadata_tracker.py:36-89).

    run_id: epoch-millis stamp — unique per run without a serial sequence.
    """
    run_id = int(time.time() * 1000)
    df = (
        spark.createDataFrame(
            [
                {
                    "run_id": run_id,
                    "run_date": None,
                    "run_timestamp": None,
                    "pipeline_name": pipeline_name,
                    "status": status,
                    "total_rows_processed": total_rows_processed,
                    "total_rows_loaded": total_rows_loaded,
                    "duration_minutes": Decimal(f"{duration_minutes:.2f}"),
                    "notes": notes,
                }
            ],
            schema=PIPELINE_RUNS_SCHEMA,
        )
        .withColumn("run_date", F.current_date())
        .withColumn("run_timestamp", F.current_timestamp())
    )
    df.coalesce(1).write.mode("append").parquet(path)
    return run_id


def log_stage_metrics(
    spark: SparkSession, path: str, run_id: int, metrics: list
) -> None:
    """Append stage_metrics rows (reference metadata_tracker.py:92-135);
    accepts operators.clean.StageMetric instances."""
    if not metrics:
        return
    rows = [
        {
            "run_id": run_id,
            "stage_name": m.stage_name,
            "rows_before": m.rows_before,
            "rows_after": m.rows_after,
            "rows_removed": m.rows_removed,
            "execution_timestamp": None,
        }
        for m in metrics
    ]
    df = spark.createDataFrame(rows, schema=STAGE_METRICS_SCHEMA).withColumn(
        "execution_timestamp", F.current_timestamp()
    )
    df.coalesce(1).write.mode("append").parquet(path)


def recent_pipeline_runs(spark: SparkSession, path: str, n: int = 10) -> DataFrame:
    """The recent_pipeline_runs view (reference metadata_schema.sql:23-34):
    O1 ORDER BY run_date DESC, run_timestamp DESC LIMIT n — planned as
    TakeOrderedAndProject (per-partition top-k, no full sort)."""
    if not fs.exists(spark, path):
        return spark.createDataFrame([], schema=PIPELINE_RUNS_SCHEMA)
    return (
        spark.read.parquet(path)
        .orderBy(F.desc("run_date"), F.desc("run_timestamp"))
        .limit(n)
    )


def log_stage_attempts(
    spark: SparkSession, path: str, run_id: int, attempts: list
) -> None:
    """Append stage-attempt rows (the timeout/retry policy's audit trail —
    reference dag1_ingest_csv.py:20-22 execution_timeout/retries made
    observable). Accepts plans.stage_policy.StageAttempt instances."""
    if not attempts:
        return
    rows = [
        {
            "run_id": run_id,
            "stage_name": a.stage_name,
            "attempt": a.attempt,
            "status": a.status,
            "seconds": float(a.seconds),
            "error": a.error,
            "execution_timestamp": None,
        }
        for a in attempts
    ]
    df = spark.createDataFrame(
        rows,
        schema=(
            "run_id long, stage_name string, attempt int, status string, "
            "seconds double, error string, execution_timestamp timestamp"
        ),
    ).withColumn("execution_timestamp", F.current_timestamp())
    df.coalesce(1).write.mode("append").parquet(path)
