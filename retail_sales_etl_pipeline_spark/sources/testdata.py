"""Readers for the driver-generated TPC-H-ish parquet testdata.

Each table is a single parquet file under an ``sf*`` directory (see
TESTDATA.md). These are plain columnar scans: filters and projections
declared downstream reach the parquet reader via Catalyst pushdown, so no
options beyond the path are needed here. At cluster scale the same code
reads a directory of many files; nothing below assumes a single file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension-sized tables that should always be broadcast when joined against
# the big fact-sized tables. At any realistic scale factor these stay orders
# of magnitude below spark.sql.autoBroadcastJoinThreshold relative to the
# fact tables; we still mark broadcasts explicitly at the join sites.
SMALL_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw longs
    (legacy conf, runtime-settable) and convert to microsecond
    TIMESTAMP_NTZ — lossless for this data (every value has zero
    sub-microsecond part).

    NTZ, not timestamp_micros (LTZ): every other testdata timestamp reads
    as NTZ wall-clock, and an LTZ ts would make date_trunc/session_window/
    to_date depend on the SESSION time zone — same integer data, different
    hour buckets under TZ=America/New_York. timestampadd on an NTZ epoch
    literal is exact integer µs arithmetic with no zone in sight."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, LongType):
        # integer division: epoch-nanos (~1.7e18) exceeds double precision
        # (2^53), so `/ 1000` would round some values off by 1 µs
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (for spark.sql use)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
