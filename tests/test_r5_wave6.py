"""Round-5 wave 6: exact correlation screen (q192), Flesch
readability (q193). Recount tests independent of the oracle hashes."""

from __future__ import annotations

import math
import re

from retail_sales_etl_pipeline_spark.plans.event_queries import (
    q192_value_hour_correlation,
)
from retail_sales_etl_pipeline_spark.plans.text_queries import (
    q193_readability,
)

from .conftest import SMOKE_SF_DIR


def test_correlation_matches_numpy(spark, duck):
    import numpy as np

    got = {r["event_type"]: r for r in q192_value_hour_correlation(spark, SMOKE_SF_DIR).collect()}
    rows = duck.execute(
        "SELECT event_type, date_part('hour', ts),"
        " CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) FROM events"
    ).fetchall()
    from collections import defaultdict

    pts = defaultdict(list)
    for et, x, y in rows:
        pts[et].append((int(x), int(y)))
    assert set(got) == set(pts)
    for et, xy in pts.items():
        xs = np.array([x for x, _ in xy], dtype=np.int64)
        ys = np.array([y for _, y in xy], dtype=np.int64)
        n = len(xy)
        num = int(n * int((xs * ys).sum()) - int(xs.sum()) * int(ys.sum()))
        r = got[et]
        assert int(r["cov_num"]) == num, et
        assert r["n"] == n
        assert r["corr_sign"] == (1 if num > 0 else -1 if num < 0 else 0)
        corr = np.corrcoef(xs.astype(float), ys.astype(float))[0, 1]
        # exact integer core + one double ratio: ppm-accurate vs numpy
        assert abs(r["r2_ppm"] - corr * corr * 1e6) <= 2, et
        assert 0 <= r["r2_ppm"] <= 1_000_000


def test_readability_matches_python_regex(spark, duck):
    got = {r["doc_id"]: r for r in q193_readability(spark, SMOKE_SF_DIR).collect()}
    rows = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    assert set(got) == {d for d, _ in rows}
    for doc_id, text in rows:
        words = len(re.findall(r"[^ ]+", text))
        sents = len(re.findall(r"[.!?]+", text)) + 1
        vgs = len(re.findall(r"[aeiouy]+", text.lower()))
        r = got[doc_id]
        assert r["n_words"] == words
        assert r["n_sentences"] == sents
        assert r["n_vowel_groups"] == vgs
        if words:
            # SQL div truncates toward zero; operands here are >= 0
            want = (
                206_835_000
                - 1_015_000 * words // sents
                - 84_600_000 * vgs // words
            )
            assert r["flesch_micro"] == want, doc_id
        else:
            assert r["flesch_micro"] is None
    # the score must actually vary across the corpus (syllable term)
    scores = {r["flesch_micro"] for r in got.values() if r["flesch_micro"] is not None}
    assert len(scores) > 10
    # sanity: float recompute agrees to the fixed-point truncation
    doc_id, text = rows[0]
    words = len(re.findall(r"[^ ]+", text))
    vgs = len(re.findall(r"[aeiouy]+", text.lower()))
    approx = 206.835 - 1.015 * words / 1 - 84.6 * vgs / words
    assert abs(got[doc_id]["flesch_micro"] / 1e6 - approx) < 0.01
