"""Fact load: the 3-way star join + partitioned write (reference dag3).

J1 (reference dag3_transform_warehouse.py:112-143): staging joins all three
dimensions on natural keys — expression keys included (COALESCE for the
unknown customer, DATE() cast for the date key) — projecting surrogate keys
and measures. All three dims are dimension-sized, so every join is an
explicit broadcast hash join: the staging/fact side streams through
map-side, shuffle-free.

The write replaces Postgres monthly RANGE partitioning (reference
warehouse_schema.sql:52-95) with Hive-style ``partitionBy(sale_month)``
parquet — partition pruning on month predicates and dynamic partition
pruning for joins come free from Spark (SURVEY §4 P1). Full-refresh
semantics (TRUNCATE+reload, reference dag3_transform_warehouse.py:117) is
``mode("overwrite")`` — one atomic truncate-and-load.

sale_key: the reference's BIGSERIAL is a per-row autoincrement; here it is
``monotonically_increasing_id`` — unique and stable within a load, not
dense, which is the scalable contract (a global dense sequence would need a
total order over 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import total_amount
from .dims import UNKNOWN_CUSTOMER


def build_fact_sales(
    staging: DataFrame,
    dim_product: DataFrame,
    dim_customer: DataFrame,
    dim_date: DataFrame,
) -> DataFrame:
    s = staging.alias("s")
    p = F.broadcast(dim_product.alias("p"))
    c = F.broadcast(dim_customer.alias("c"))
    d = F.broadcast(dim_date.alias("d"))

    joined = (
        s.join(p, F.col("s.stock_code") == F.col("p.stock_code"), "inner")
        .join(
            c,
            F.coalesce(F.col("s.customer_id"), F.lit(UNKNOWN_CUSTOMER))
            == F.col("c.customer_id"),
            "inner",
        )
        .join(d, F.to_date(F.col("s.invoice_date")) == F.col("d.date"), "inner")
    )
    return joined.select(
        F.monotonically_increasing_id().alias("sale_key"),
        F.col("s.invoice_no").alias("invoice_no"),
        F.col("p.product_key").alias("product_key"),
        F.col("c.customer_key").alias("customer_key"),
        F.col("d.date_key").alias("date_key"),
        F.col("s.invoice_date").alias("invoice_date"),
        F.col("s.quantity").alias("quantity"),
        F.col("s.unit_price").alias("unit_price"),
        total_amount(F.col("s.quantity"), F.col("s.unit_price")).alias("total_amount"),
        F.date_format(F.col("s.invoice_date"), "yyyy-MM").alias("sale_month"),
    )


def write_fact_sales(fact: DataFrame, path: str, files_per_partition: int = 1) -> None:
    """P1: monthly-partitioned parquet, full-refresh overwrite (S5/M5).

    Without the repartition, every upstream task writes its own file into
    every month directory (tasks x months small files). Clustering by the
    partition column first gives exactly ``files_per_partition`` files per
    month; raise it at scale so each file stays near the 128 MB-1 GB sweet
    spot and the write parallelism matches the cluster.
    """
    # pmod is already non-negative for a positive divisor; abs(hash(..))
    # would ARITHMETIC_OVERFLOW under ANSI mode when hash() returns
    # Int.MinValue — a ~2^-32-per-row landmine at billions of rows.
    salt = F.pmod(F.hash("invoice_no"), F.lit(files_per_partition))
    (
        fact.repartition(F.col("sale_month"), salt)
        .write.mode("overwrite")
        .partitionBy("sale_month")
        .parquet(path)
    )


def write_fact_sales_incremental(fact_delta: DataFrame, path: str) -> None:
    """Incremental refresh: overwrite ONLY the month partitions present in
    the delta, leaving all other months untouched.

    The reference full-refreshes the entire fact table every run
    (TRUNCATE + reload) — fine at 541K rows, ruinous at 100 TB where a
    daily load touches one or two month partitions. Dynamic partition
    overwrite rewrites exactly the partitions the delta contains: the
    idempotent re-runnable daily load (re-running the same day's load
    converges to the same state).
    """
    spark = fact_delta.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            fact_delta.repartition(F.col("sale_month"))
            .write.mode("overwrite")
            .partitionBy("sale_month")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def ri_violations(fact: DataFrame, dim: DataFrame, key: str) -> int:
    """J2: referential-integrity check — fact keys missing from a dim.

    The reference enforces FKs in Postgres (warehouse_schema.sql:46-51);
    Spark has no constraints, so RI is a validation op: a broadcast
    left-anti join that must be empty. (J1's inner joins guarantee this by
    construction — the check documents it.)
    """
    return fact.join(F.broadcast(dim.select(key)), key, "left_anti").count()
