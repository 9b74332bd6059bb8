"""Composite and remaining grouping/join-family queries: CUBE, semi-join,
and a TPC-H-Q3-shaped compound plan (filter + 3-way join + agg + top-k)
exercising the optimizer end-to-end in one statement."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import decimal_str, money_sum
from ..sources import load_table
from .registry import register


@register(
    "q48_cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR)
               AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over (status, priority): all four grouping sets in one "
    "shuffle, GROUPING flags disambiguating subtotals — completes the "
    "grouping-set family next to q42's ROLLUP.",
    tags=("analytic", "cube"),
)
def q48_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n"),
        decimal_str(money_sum("o_totalprice")).alias("revenue"),
    )


@register(
    "q49_semi_join",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 400000
    )
    """,
    doc="LEFT SEMI join (EXISTS): customers with at least one big-ticket "
    "order — returns each left row at most once, never multiplies, and "
    "Spark plans it as a broadcast semi join when the filtered probe side "
    "is small.",
    tags=("join", "semi"),
)
def q49_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@register(
    "q50_top_unshipped_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS VARCHAR)
               AS order_revenue,
           CAST(o_orderdate AS VARCHAR) AS order_ts,
           o_orderpriority
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND l_shipdate > o_orderdate
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,6)) DESC,
             o_orderkey
    LIMIT 10
    """,
    doc="TPC-H-Q3-shaped compound plan: segment filter pushed to the "
    "customer scan, date predicate pushed to lineitem, customer broadcast, "
    "one shuffle join + grouped decimal revenue + deterministic top-10. "
    "One statement exercising pushdown, broadcast choice, partial "
    "aggregation and TakeOrdered together.",
    tags=("composite", "join", "aggregate", "sort"),
)
def q50_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    ).cast("decimal(38,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("_rev"))
        .orderBy(F.desc("_rev"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.col("_rev").cast("string").alias("order_revenue"),
            F.col("o_orderdate").cast("string").alias("order_ts"),
            "o_orderpriority",
        )
    )


@register(
    "q114_regional_revenue",
    oracle="""
    SELECT n_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l_discount AS DECIMAL(18,4)))
                AS DECIMAL(38,6)) AS VARCHAR) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN supplier ON s_nationkey = n_nationkey
    JOIN customer ON c_nationkey = s_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey AND l_suppkey = s_suppkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H-Q5-shaped six-way join: revenue by nation for orders "
    "where the supplier and customer share the nation, restricted to "
    "one region. The join-planning stress test: region/nation are "
    "row-scale (broadcast without being asked), supplier and customer "
    "are dimension-scale (explicit broadcast), and the one genuinely "
    "big join — lineitem to orders — is the only shuffle; the "
    "(l_suppkey = s_suppkey) AND (c_nationkey = s_nationkey) cycle is "
    "expressed as equi-keys so Catalyst never falls back to a "
    "cartesian+filter. Region filter prunes at the region scan and "
    "cascades through the broadcasts before any big table moves. "
    "Decimal revenue for order-independent exactness.",
    tags=("composite", "join", "aggregate"),
)
def q114_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    ).cast("decimal(38,6)")
    dims = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(dims),
            (li.l_suppkey == dims.s_suppkey)
            & (cust.c_nationkey == dims.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            rev.cast("string").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )
