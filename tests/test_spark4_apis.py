"""Spark 4 API twins must be result-identical to the JVM-side registry
forms they mirror: VARIANT vs get_json_object (q36), Python UDTF vs the
sequence+slice chunker (q69), SQL pipe syntax vs the fluent chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.functions import modern
from retail_sales_etl_pipeline_spark.plans.registry import load_all
from retail_sales_etl_pipeline_spark.sources import load_table

from .conftest import SMOKE_SF_DIR

REGISTRY = load_all()


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_variant_json_rollup_equals_get_json_object(spark):
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    got = modern.json_props_variant(ev)
    want = REGISTRY["q36_event_json_props"].spark_fn(spark, SMOKE_SF_DIR)
    assert _rows(got) == _rows(want)


def test_udtf_chunker_equals_q69(spark):
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    got = modern.chunk_documents_udtf(spark, docs)
    want = REGISTRY["q69_doc_chunking"].spark_fn(spark, SMOKE_SF_DIR)
    assert _rows(got) == _rows(want)


def test_pipe_syntax_equals_dataframe_chain(spark):
    got = modern.pricing_summary_pipe_sql(spark, SMOKE_SF_DIR)
    li = load_table(spark, SMOKE_SF_DIR, "lineitem")
    want = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("string")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("string")
        .alias("sum_base_price"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    assert _rows(got.select(sorted(got.columns))) == _rows(
        want.select(sorted(want.columns))
    )
