"""Reference-parity queries (SURVEY.md §2 operator inventory).

Each query re-expresses one or more reference operators over the TPC-H-ish
testdata tables, with `lineitem` playing the staging/fact role and
`part`/`customer`/`orders`-derived dates playing the dimensions (FIXTURES.md
§B role mapping). Reference file:line citations are in each docstring so
parity can be checked against the original.

Scale notes apply to every query here: scans are plain parquet reads with
filters/projections pushed down by Catalyst; joins against dimension-sized
tables are explicit broadcasts (no shuffle of the big side); all
aggregations are partial (map-side) + final hash aggregates planned by
Spark — nothing below materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import decimal_str, money_sum, pg_dayofweek
from ..sources import load_table
from .registry import register

# ---------------------------------------------------------------------------
# §2.2 filters (F1-F3) — the cleaning predicates
# ---------------------------------------------------------------------------


@register(
    "q01_clean_filters",
    oracle="""
    SELECT * FROM lineitem
    WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
      AND l_quantity IS NOT NULL AND l_shipdate IS NOT NULL
      AND l_extendedprice IS NOT NULL
      AND l_quantity <> 0 AND l_extendedprice > 0
    """,
    doc="F1 null-drop + F2 zero-qty + F3 non-positive-price filters "
    "(reference dag2_clean_validate.py:22-103). One scan, all three "
    "predicates pushed to the parquet reader.",
    tags=("parity", "filter"),
)
def q01_clean_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.dropna(
            subset=["l_orderkey", "l_partkey", "l_quantity", "l_shipdate", "l_extendedprice"]
        )
        .filter(F.col("l_quantity") != 0)
        .filter(F.col("l_extendedprice") > 0)
    )


# ---------------------------------------------------------------------------
# §2.5 window dedup (W1)
# ---------------------------------------------------------------------------


@register(
    "q02_dedup_rownumber",
    oracle="""
    SELECT * FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_orderkey, l_partkey, l_suppkey
        ORDER BY l_linenumber
    ) = 1
    """,
    doc="W1 ROW_NUMBER dedup: survivor = first row by a deterministic "
    "tiebreak within the dedup key (reference dag2_clean_validate.py:43-69, "
    "which orders by ctid ~ insertion order; here l_linenumber).",
    tags=("parity", "window"),
)
def q02_dedup_rownumber(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_partkey", "l_suppkey").orderBy("l_linenumber")
    return (
        li.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# §2.4 dimension builds (A1-A3) + §2.11 sentinel seed (M3)
# ---------------------------------------------------------------------------


@register(
    "q03_dim_part",
    oracle="""
    SELECT p_partkey,
           MAX(p_name) AS description,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey
    """,
    doc="A1 dim_product build: GROUP BY natural key + MAX(description) "
    "(reference dag3_transform_warehouse.py:41-46), via a broadcast join "
    "to the part attributes (dimension side is tiny → no shuffle of "
    "lineitem beyond the aggregation).",
    tags=("parity", "aggregate", "join"),
)
def q03_dim_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy("p_partkey")
        .agg(
            F.max("p_name").alias("description"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q04_dim_customer_sentinel",
    oracle="""
    SELECT o_custkey AS customer_nat_key, MAX(o_orderpriority) AS top_priority
    FROM orders GROUP BY o_custkey
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS customer_nat_key, 'UNKNOWN' AS top_priority
    """,
    doc="A2 dim_customer build (GROUP BY + MAX, reference "
    "dag3_transform_warehouse.py:69-74) + M3 sentinel-row seed for the "
    "unknown-member path (reference dag3_transform_warehouse.py:63-67).",
    tags=("parity", "aggregate", "upsert"),
)
def q04_dim_customer_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    dim = orders.groupBy(F.col("o_custkey").alias("customer_nat_key")).agg(
        F.max("o_orderpriority").alias("top_priority")
    )
    # sentinel from range(1), not createDataFrame: a pure-JVM one-row
    # relation skips the driver-side Arrow conversion and local-scan
    # node, shaving session overhead off the plan (this was the bench's
    # slowest query purely from that fixed cost)
    sentinel = spark.range(1).select(
        F.lit(-1).cast("bigint").alias("customer_nat_key"),
        F.lit("UNKNOWN").alias("top_priority"),
    )
    return dim.unionByName(sentinel)


@register(
    "q05_dim_date",
    oracle="""
    SELECT CAST("date" AS VARCHAR)            AS date_iso,
           CAST(year("date") AS INTEGER)      AS year,
           CAST(month("date") AS INTEGER)     AS month,
           CAST(day("date") AS INTEGER)       AS day,
           CAST(quarter("date") AS INTEGER)   AS quarter,
           CAST(dayofweek("date") AS INTEGER) AS day_of_week
    FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS "date" FROM orders)
    """,
    doc="A3 dim_date build: DISTINCT DATE(ts) + EXTRACT parts (reference "
    "dag3_transform_warehouse.py:91-103). day_of_week is Postgres DOW "
    "0=Sunday..6=Saturday — Spark dayofweek()-1 (C2 trap). The date is "
    "emitted as an ISO string: pandas renders DuckDB DATE as a midnight "
    "Timestamp but Spark DateType as datetime.date, which breaks "
    "value-hash parity for a semantically identical result.",
    tags=("parity", "aggregate", "scalar"),
)
def q05_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("date")
    return (
        orders.select(F.to_date("o_orderdate").alias("date"))
        .distinct()
        .select(
            d.cast("string").alias("date_iso"),
            F.year(d).cast("int").alias("year"),
            F.month(d).cast("int").alias("month"),
            F.dayofmonth(d).cast("int").alias("day"),
            F.quarter(d).cast("int").alias("quarter"),
            pg_dayofweek(d).alias("day_of_week"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 the star join (J1) + §2.2 computed measure (F7)
# ---------------------------------------------------------------------------


@register(
    "q06_fact_star_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_partkey, s_suppkey, o_custkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_key,
           l_quantity AS quantity,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey  = p_partkey
    JOIN supplier ON l_suppkey  = s_suppkey
    """,
    doc="J1 multi-way inner equi-join fact load with expression keys + F7 "
    "computed measure (reference dag3_transform_warehouse.py:112-143). "
    "part/supplier are broadcast (dimension-sized); lineitem⋈orders is the "
    "only shuffle join and AQE handles its skew.",
    tags=("parity", "join"),
)
def q06_fact_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey, "inner")
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_partkey",
            "s_suppkey",
            "o_custkey",
            F.to_date("o_orderdate").cast("string").alias("date_key"),
            F.col("l_quantity").alias("quantity"),
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 aggregates (A4-A9)
# ---------------------------------------------------------------------------


@register(
    "q07_agg_counts",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT)                   AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)  AS n_supps
    FROM lineitem
    """,
    doc="A4 COUNT(*) + A5 exact COUNT(DISTINCT) validation probes "
    "(reference dag2_clean_validate.py:111-121, verify_ingestion.py:103-110).",
    tags=("parity", "aggregate"),
)
def q07_agg_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register(
    "q08_revenue_by_flag",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR)
               AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR)
               AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS VARCHAR)
               AS sum_disc_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A6 SUM over money with grouped pricing-summary shape (reference "
    "dag3_transform_warehouse.py:163 revenue; README.md:210). Money goes "
    "through DecimalType so totals are exact and shuffle-order-independent; "
    "rendered as fixed-scale strings for engine-neutral hashing.",
    tags=("parity", "aggregate", "decimal"),
)
def q08_revenue_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        decimal_str(money_sum("l_quantity")).alias("sum_qty"),
        decimal_str(money_sum("l_extendedprice")).alias("sum_base_price"),
        decimal_str(F.sum(disc_price), 38, 6).alias("sum_disc_price"),
    )


@register(
    "q09_minmax_dates",
    oracle="""
    SELECT MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    """,
    doc="A7 MIN/MAX timestamp date-range probe (reference "
    "verify_ingestion.py:91-97,202-209).",
    tags=("parity", "aggregate"),
)
def q09_minmax_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q10_null_counts",
    oracle="""
    SELECT CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_quantity,
           CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_discount,
           CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_returnflag
    FROM lineitem
    """,
    doc="A8/F6 conditional aggregate null-count probe, one pass over the "
    "table with multiple agg expressions (reference "
    "verify_ingestion.py:119-126).",
    tags=("parity", "aggregate"),
)
def q10_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def nulls(c: str) -> F.Column:
        return F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long")

    return li.agg(
        nulls("l_quantity").alias("null_quantity"),
        nulls("l_discount").alias("null_discount"),
        nulls("l_returnflag").alias("null_returnflag"),
    )


@register(
    "q11_dup_probe",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dup_groups FROM (
        SELECT l_orderkey, l_partkey FROM lineitem
        GROUP BY l_orderkey, l_partkey HAVING COUNT(*) > 1
    )
    """,
    doc="A9 GROUP BY + HAVING duplicate-key probe (reference "
    "verify_ingestion.py:351-358). Partial+final hash agg is automatic.",
    tags=("parity", "aggregate"),
)
def q11_dup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_partkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count(F.lit(1)).alias("n_dup_groups"))
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / top-k (O1-O3)
# ---------------------------------------------------------------------------


@register(
    "q12_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="O1 ORDER BY ... DESC LIMIT n (reference metadata_schema.sql:23-34 "
    "recent_pipeline_runs view). Spark plans TakeOrderedAndProject — a "
    "per-partition top-k then a k-row driver merge, never a full sort; "
    "o_orderkey tiebreak makes the row set deterministic.",
    tags=("parity", "sort"),
)
def q12_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.7 set ops (U1)
# ---------------------------------------------------------------------------


@register(
    "q13_union_counts",
    oracle="""
    SELECT 'lineitem' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
    UNION ALL SELECT 'orders',   CAST(COUNT(*) AS BIGINT) FROM orders
    UNION ALL SELECT 'customer', CAST(COUNT(*) AS BIGINT) FROM customer
    UNION ALL SELECT 'part',     CAST(COUNT(*) AS BIGINT) FROM part
    UNION ALL SELECT 'supplier', CAST(COUNT(*) AS BIGINT) FROM supplier
    UNION ALL SELECT 'nation',   CAST(COUNT(*) AS BIGINT) FROM nation
    UNION ALL SELECT 'region',   CAST(COUNT(*) AS BIGINT) FROM region
    """,
    doc="U1 UNION ALL of per-table counts (reference README.md:199-207 "
    "verification query).",
    tags=("parity", "setop"),
)
def q13_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out: DataFrame | None = None
    for t in ("lineitem", "orders", "customer", "part", "supplier", "nation", "region"):
        df = load_table(spark, sf_dir, t).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(t).alias("table_name"), F.col("n")
        )
        out = df if out is None else out.unionByName(df)
    assert out is not None
    return out


# ---------------------------------------------------------------------------
# §2.2/§2.8 scalar projections (F5/F6/C4/C5)
# ---------------------------------------------------------------------------


@register(
    "q14_case_coalesce",
    oracle="""
    SELECT c_custkey,
           COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'normal'
                ELSE 'high' END AS balance_band
    FROM customer
    """,
    doc="F5 COALESCE + C5 CASE WHEN projections (reference "
    "dag2_clean_validate.py:56, dag3_transform_warehouse.py:135, "
    "verify_ingestion.py:121-124).",
    tags=("parity", "scalar"),
)
def q14_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"),
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "normal")
        .otherwise("high")
        .alias("balance_band"),
    )


# ---------------------------------------------------------------------------
# §2.3 referential-integrity check (J2) — left anti join
# ---------------------------------------------------------------------------


@register(
    "q15_ri_antijoin",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS orphan_rows
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
    doc="J2 referential-integrity emulation: fact→dim LEFT ANTI join must be "
    "empty (reference warehouse_schema.sql:46-51 FK constraints).",
    tags=("parity", "join"),
)
def q15_ri_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_rows"))
    )


# ---------------------------------------------------------------------------
# §4 P1 partition-column derivation + monthly rollup
# ---------------------------------------------------------------------------


@register(
    "q16_monthly_rollup",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS sale_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR)
               AS month_revenue
    FROM orders
    GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
    doc="P1 monthly partition-key derivation + rollup: the reference "
    "range-partitions fact_sales by month (warehouse_schema.sql:52-95); our "
    "fact writes partitionBy(sale_month) and this query is the pruning key.",
    tags=("parity", "aggregate", "partition"),
)
def q16_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("sale_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            decimal_str(money_sum("o_totalprice")).alias("month_revenue"),
        )
    )
