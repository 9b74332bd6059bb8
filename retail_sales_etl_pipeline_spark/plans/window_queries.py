"""General window-function, string-function, and set-operation coverage.

The reference's only window is ROW_NUMBER (SURVEY §2.5) and it has no
string functions or set ops beyond UNION ALL — but an analytics engine's
users reach for these daily, so they're covered and oracle-checked here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import decimal_str
from ..sources import load_table
from .registry import register


@register(
    "q45_window_suite",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           lag(o_orderkey) OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,2)) AS VARCHAR)
               AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Window-function suite per customer order history: rank/dense_rank/"
    "ntile/lag/lead plus a running decimal sum with an explicit ROWS frame. "
    "All six functions share one (o_custkey) partitioning, so Spark plans a "
    "single shuffle + sort for the whole set. Deterministic via the "
    "(o_orderdate, o_orderkey) total order.",
    tags=("window",),
)
def q45_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        decimal_str(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(wsum)
        ).alias("running_spend"),
    )


@register(
    "q54_range_frame_window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
                AS INTEGER) AS day_ord,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                AS DECIMAL(38,2)) AS VARCHAR) AS spend_30d,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_30d
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey
      ORDER BY date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
    )
    """,
    doc="RANGE-frame window (value-based, not row-based): per order, the "
    "same customer's trailing-30-DAY spend and order count — the frame "
    "holds every row whose day ordinal is within 30, however many rows "
    "that is, including all same-day peers. Distinct from q45's ROWS "
    "frames; one shuffle on the partition key serves both aggregates. "
    "Day ordinals are integer datediffs from a fixed epoch so both "
    "engines sort and bound the frame identically; the spend is a "
    "decimal sum rendered as a fixed-scale string.",
    tags=("window",),
)
def q54_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    day_ord = F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01")).cast("int")
    base = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", day_ord.alias("day_ord")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_ord")
        .rangeBetween(-30, 0)
    )
    return base.select(
        "o_orderkey",
        "o_custkey",
        "day_ord",
        decimal_str(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
        ).alias("spend_30d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_orders_30d"),
    )


@register(
    "q46_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 10) AS name_prefix,
           CAST(length(p_name) AS INTEGER) AS name_len,
           concat(p_brand, '/', p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_slug,
           CAST(contains(p_type, 'BRUSHED') AS INTEGER) AS is_brushed,
           trim(p_name) AS name_trim,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           split_part(p_type, ' ', 1) AS type_head
    FROM part
    """,
    doc="Scalar string-function coverage (upper/substring/length/concat/"
    "replace/contains/trim/lpad/split-head) — pure projection, stays in "
    "whole-stage codegen, pushdown-transparent.",
    tags=("scalar", "string"),
)
def q46_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.contains(F.col("p_type"), F.lit("BRUSHED")).cast("int").alias("is_brushed"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
    )


@register(
    "q47_set_ops",
    oracle="""
    SELECT 'with_orders_no_lineitems' AS cohort, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT o_custkey FROM orders
      EXCEPT
      SELECT o_custkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    )
    UNION ALL
    SELECT 'custkeys_in_both_small_large', CAST(COUNT(*) AS BIGINT) FROM (
      SELECT o_custkey FROM orders WHERE o_totalprice < 50000
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_totalprice >= 50000
    )
    """,
    doc="Set operations beyond the reference's UNION ALL: EXCEPT and "
    "INTERSECT (distinct semantics both engines). Spark plans these as "
    "aggregate + anti/semi joins — same shuffle shape as the joins they "
    "desugar to.",
    tags=("setop",),
)
def q47_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    with_li = orders.join(li, orders.o_orderkey == li.l_orderkey).select("o_custkey")
    # subtract == SQL EXCEPT (distinct semantics)
    no_li = orders.select("o_custkey").distinct().subtract(with_li.distinct())
    small = orders.filter(F.col("o_totalprice") < 50000).select("o_custkey")
    large = orders.filter(F.col("o_totalprice") >= 50000).select("o_custkey")
    both = small.intersect(large)
    a = no_li.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("with_orders_no_lineitems").alias("cohort"), "n"
    )
    b = both.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("custkeys_in_both_small_large").alias("cohort"), "n"
    )
    return a.unionByName(b)


@register(
    "q56_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str
    FROM orders o
    WHERE o_totalprice = (
      SELECT MAX(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    """,
    doc="Correlated scalar subquery (each customer's maximum-price order): "
    "Catalyst DECORRELATES it into an aggregate + join rather than "
    "re-executing the subquery per row — the rewrite that makes "
    "correlated SQL viable at scale. Expressed through spark.sql to "
    "exercise the actual subquery path, not a hand-desugared join.",
    tags=("subquery",),
)
def q56_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q56_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING) AS price_str
        FROM q56_orders o
        WHERE o_totalprice = (
          SELECT MAX(o2.o_totalprice) FROM q56_orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "q57_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                AS INTEGER) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    doc="Explicit GROUPING SETS — the general form ROLLUP (q42) and CUBE "
    "(q48) desugar to — with an arbitrary, non-hierarchical set list and "
    "GROUPING flags distinguishing NULL-as-total from NULL data. Spark "
    "plans one Expand + single aggregate over the expanded rows: one "
    "shuffle regardless of how many sets.",
    tags=("aggregate",),
)
def q57_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q57_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                    AS INT) AS gid
        FROM q57_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


N_BINS = 4


@register(
    "q116_quantile_binning",
    oracle=f"""
    WITH binned AS (
      SELECT source, n_chars,
             ntile({N_BINS}) OVER (
               PARTITION BY source ORDER BY n_chars, doc_id
             ) AS bin
      FROM documents
    )
    SELECT source, CAST(bin AS INTEGER) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS lo_chars,
           CAST(MAX(n_chars) AS BIGINT) AS hi_chars
    FROM binned GROUP BY source, bin
    """,
    doc=f"Equi-depth quantile binning: each source's documents split into "
    f"{N_BINS} equal-count length bins (NTILE), with per-bin bounds — "
    "the binning step behind length-balanced batch construction and "
    "per-stratum quality audits (equal-WIDTH bins hide the long tail "
    "that dominates token mass). Ties broken by doc_id so bin edges are "
    "deterministic under any partitioning; the window and the bin "
    "aggregate share the (source) shuffle. Scale note: NTILE needs its "
    "partition sorted — per-SOURCE partitions; for a single giant "
    "stratum switch to percentile_approx edges + a map-side bin lookup "
    "(q78/q82's pattern), trading exact equal counts for no sort.",
    tags=("text", "window", "profiling"),
)
def q116_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    binned = docs.withColumn("bin", F.ntile(N_BINS).over(w))
    return binned.groupBy("source", F.col("bin").cast("int").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("lo_chars"),
        F.max("n_chars").cast("long").alias("hi_chars"),
    )
