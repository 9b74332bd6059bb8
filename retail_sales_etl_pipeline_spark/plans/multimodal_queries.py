"""Multimodal query: binary-payload feature extraction via mapInPandas,
oracle-checked against pure-SQL byte math (the fake features are chosen to
be SQL-computable, so the Arrow plumbing itself is what gets verified)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import attach_payload, extract_features
from ..sources import load_table
from .registry import register


@register(
    "q37_multimodal_features",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substring(hex(encode(text)), 1, 8) AS header_hex,
           CAST(octet_length(encode(text)) // 4 AS BIGINT) AS fake_tokens
    FROM documents
    """,
    doc="Multimodal plumbing: documents carried as opaque binary payloads "
    "+ mime metadata, features extracted by an Arrow-batched mapInPandas "
    "(real decode stubbed - no codecs in this environment; features are "
    "deterministic byte math so the oracle checks the full binary path: "
    "encode -> Arrow transfer -> per-batch pandas -> result schema).",
    tags=("multimodal", "pandas-udf"),
)
def q37_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))
