"""Round-8 wave: q243 per-document character entropy.

Independent recount: pure-Python character histogram + the same micro-nat
fixed point, compared row-for-row against the registered query at smoke
scale — plus hand-computed closed forms on constructed documents.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.plans.text_queries import (
    ENT_LOW_MICRO,
    q243_char_entropy,
)
from retail_sales_etl_pipeline_spark.sources import load_table

from .conftest import SMOKE_SF_DIR


def _L(x: int) -> int:
    return math.floor(math.log(x) * 1_000_000 + 0.5)


def _tdiv(a: int, b: int) -> int:
    """Spark `div` truncates toward zero (Python // floors)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _entropy_micro(text: str) -> tuple[int, int, int]:
    c = Counter(text)
    n = sum(c.values())
    s = sum(ci * (_L(n) - _L(ci)) for ci in c.values())
    return n, len(c), _tdiv(s, n)


def test_q243_matches_python_recount(spark):
    got = {
        r["doc_id"]: r
        for r in q243_char_entropy(spark, SMOKE_SF_DIR).collect()
    }
    docs = (
        load_table(spark, SMOKE_SF_DIR, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select("doc_id", "text")
        .collect()
    )
    assert len(docs) == len(got) > 0
    for d in docs:
        n, k, h = _entropy_micro(d["text"])
        r = got[d["doc_id"]]
        assert r["n_chars"] == n
        assert r["n_distinct_chars"] == k
        assert r["char_entropy_micro"] == h
        assert r["low_entropy"] == (1 if h < ENT_LOW_MICRO else 0)


def test_q243_closed_forms(spark, tmp_path):
    """Hand-computable documents: a one-char run has zero entropy (low),
    a uniform two-char doc has ln(2) nats, uniform 16-char has ln(16) ~
    2.77 nats (above the 2.0 gate)."""
    d = str(tmp_path / "documents.parquet")
    rows = [
        (1, "aaaaaaaa", "en", "s", 8),
        (2, "abababab", "en", "s", 8),
        (3, "0123456789abcdef", "en", "s", 16),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(d)
    got = {r["doc_id"]: r for r in q243_char_entropy(spark, str(tmp_path)).collect()}
    assert got[1]["char_entropy_micro"] == 0 and got[1]["low_entropy"] == 1
    assert abs(got[2]["char_entropy_micro"] - 693_147) <= 1
    assert got[2]["low_entropy"] == 1
    assert abs(got[3]["char_entropy_micro"] - 2_772_589) <= 1
    assert got[3]["low_entropy"] == 0
