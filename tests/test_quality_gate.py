"""q91 composed quality gate: python recomputation of every rule flag and
consistency with the q25/q65 signals it composes (the oracle proves
cross-engine parity; this proves the rules mean what they claim)."""

from __future__ import annotations

from retail_sales_etl_pipeline_spark.plans.text_queries import (
    GATE_DUP_TRIGRAM_MAX,
    GATE_MIN_TOKENS,
    GATE_SPAN_MAX,
    GATE_SPAN_MIN,
    GATE_TOP_TOKEN_MAX,
    q25_text_quality,
    q65_repetition_scores,
    q91_quality_gate,
)

SF = "/root/testdata/sf0.001"


def test_quality_gate_flags_match_python_and_components(spark):
    got = {r.doc_id: r for r in q91_quality_gate(spark, SF).collect()}
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert set(got) == set(texts)

    import collections

    fired = collections.Counter()
    for did, text in texts.items():
        toks = text.split(" ")
        n = len(toks)
        punct = sum(text.count(c) for c in ".,;:!?")
        span = len(text) / n
        if n >= 3:
            tg = [" ".join(toks[i : i + 3]) for i in range(n - 2)]
            dup = (len(tg) - len(set(tg))) / len(tg)
            top = max(collections.Counter(toks).values()) / n
        else:
            dup = top = 0.0
        r = got[did]
        assert r.r_too_short == (n < GATE_MIN_TOKENS)
        assert r.r_punct_heavy == (punct > n)
        assert r.r_span == (span < GATE_SPAN_MIN or span > GATE_SPAN_MAX)
        assert r.r_dup_trigrams == (dup > GATE_DUP_TRIGRAM_MAX)
        assert r.r_top_token == (top > GATE_TOP_TOKEN_MAX)
        want_keep = not (
            r.r_too_short
            or r.r_punct_heavy
            or r.r_span
            or r.r_dup_trigrams
            or r.r_top_token
        )
        assert r.keep == want_keep
        for name in (
            "r_too_short",
            "r_punct_heavy",
            "r_span",
            "r_dup_trigrams",
            "r_top_token",
        ):
            if getattr(r, name):
                fired[name] += 1

    # the gate must not be vacuous on real data: at least one rule fires
    # somewhere and at least one document survives
    assert sum(fired.values()) > 0, "no rule ever fired — thresholds vacuous"
    assert any(r.keep for r in got.values())

    # consistency with the component queries it composes
    q25 = {r.doc_id: r for r in q25_text_quality(spark, SF).collect()}
    for did, r in got.items():
        assert r.r_too_short == (q25[did].quality_band == "too_short") or not r.r_too_short
        if q25[did].quality_band == "too_short":
            assert r.r_too_short
    q65 = {r.doc_id: r for r in q65_repetition_scores(spark, SF).collect()}
    for did, r65 in q65.items():
        assert got[did].r_dup_trigrams == (r65.dup_trigram_frac > GATE_DUP_TRIGRAM_MAX)
        assert got[did].r_top_token == (r65.top_token_frac > GATE_TOP_TOKEN_MAX)
