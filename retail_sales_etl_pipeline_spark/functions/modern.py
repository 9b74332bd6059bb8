"""Spark 4 API-surface twins: VARIANT semi-structured access, Python
UDTFs, and SQL pipe syntax — each expressed as an equality twin of an
existing JVM-side registry query, so adopting the newer API is proven
result-identical before anyone switches (tests/test_spark4_apis.py).

These are TWINS, not replacements:

- VARIANT (``parse_json`` + ``variant_get``) is the right call when a
  JSON column is probed repeatedly with different paths — parse once,
  bind many — while ``get_json_object`` re-parses per call but needs no
  schema commitment. Both stay JVM-side.
- A Python UDTF is the row-expanding escape hatch for logic SQL can't
  express; chunking CAN be expressed in SQL (q69), which is exactly why
  it makes a good UDTF correctness anchor. The UDTF form pays the
  Python-worker round trip — keep it out of hot paths (the q55/q83
  trade, one level up).
- SQL pipe syntax (``|>``) is a readability form; it compiles to the
  same plan as the fluent DataFrame chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def json_props_variant(ev: DataFrame) -> DataFrame:
    """q36's per-type JSON rollup through the VARIANT type: parse the
    props payload once into a variant, then bind ``$.k`` — identical
    result to the get_json_object form (proven by test)."""
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("k_total"),
        F.count(F.lit(1)).alias("n"),
    )


def register_chunker_udtf(spark: SparkSession, name: str = "doc_chunker") -> None:
    """Register a Python UDTF with q69's exact chunking semantics
    (32-token windows, stride 24, 1-based slice bounds). Lazy import so
    module import never needs an active session."""
    from pyspark.sql.functions import udtf

    from ..plans.search_queries import CHUNK_STRIDE, CHUNK_TOKENS

    @udtf(
        returnType=(
            "chunk_id: long, start: long, chunk_len: long, chunk_text: string"
        )
    )
    class DocChunker:
        def eval(self, text: str):  # noqa: D401 — UDTF contract
            if text is None:
                return
            tok = text.split(" ")
            for start in range(0, len(tok), CHUNK_STRIDE):
                chunk = tok[start : start + CHUNK_TOKENS]
                yield (
                    start // CHUNK_STRIDE,
                    start,
                    len(chunk),
                    " ".join(chunk),
                )

    spark.udtf.register(name, DocChunker)


def chunk_documents_udtf(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """q69 through the UDTF: LATERAL join fan-out per document row."""
    register_chunker_udtf(spark)
    docs.filter(F.col("text").isNotNull()).select("doc_id", "text").createOrReplaceTempView(
        "_docs_for_chunking"
    )
    return spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.start, c.chunk_len, c.chunk_text "
        "FROM _docs_for_chunking d, LATERAL doc_chunker(d.text) c"
    )


def pricing_summary_pipe_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q08's grouped revenue summary in SQL pipe syntax — same plan, same
    result as the fluent chain (proven by test)."""
    from ..sources import load_table

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_pipe")
    return spark.sql(
        """
        FROM _li_pipe
        |> AGGREGATE
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS STRING)
                 AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING)
                 AS sum_base_price,
             CAST(COUNT(*) AS BIGINT) AS n_rows
           GROUP BY l_returnflag, l_linestatus
        """
    )
