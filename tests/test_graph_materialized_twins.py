"""From-materialized graph twins (q199/q200/q201) must be row-identical
to their self-contained originals (q164/q172/q188), and the pair
checkpoint must be paid once per (session, corpus)."""

from __future__ import annotations

from retail_sales_etl_pipeline_spark.plans import dedup_queries as dq

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_materialize_once_per_session(spark):
    dq._PAIRS_CACHE.clear()
    p1 = dq.materialize_verified_pairs(spark, SF)
    p2 = dq.materialize_verified_pairs(spark, SF)
    assert p1 == p2  # second call reuses the checkpoint path
    # and the checkpoint holds exactly the self-contained pair list
    got = _rows(spark.read.parquet(p1))
    want = _rows(
        dq.q21_ngram_jaccard_pairs(spark, SF).select("doc_a", "doc_b")
    )
    assert got == want


def test_pagerank_twin_identity(spark):
    assert _rows(dq.q199_pagerank_materialized(spark, SF)) == _rows(
        dq.q164_pagerank_neardup(spark, SF)
    )


def test_triangles_twin_identity(spark):
    assert _rows(dq.q200_triangles_materialized(spark, SF)) == _rows(
        dq.q172_triangle_count(spark, SF)
    )


def test_chain_depth_twin_identity(spark):
    assert _rows(dq.q201_chain_depth_materialized(spark, SF)) == _rows(
        dq.q188_neardup_chain_depth(spark, SF)
    )


# Round-11 twins: the prefix-index family and the incremental-CC path.


def test_prefix_index_materialize_once_per_session(spark):
    dq._PF_INDEX_CACHE.clear()
    t1 = dq.materialize_prefix_index(spark, SF)
    t2 = dq.materialize_prefix_index(spark, SF)
    assert t1 == t2
    t_pfx, t_tg = t1
    # the checkpoint holds exactly the self-contained index frames
    pfx_df, tg_df, docs_df = dq._pf_index_frames(spark, SF)
    n_docs = docs_df.count()

    assert _rows(spark.table(t_pfx)) == _rows(pfx_df)
    got_tg = sorted(
        (r.doc_id, tuple(r.tg)) for r in spark.table(t_tg).collect()
    )
    want_tg = sorted((r.doc_id, tuple(r.tg)) for r in tg_df.collect())
    assert got_tg == want_tg
    # n_docs from the tg table equals the self-contained count
    assert spark.table(t_tg).count() == n_docs
    # the layout IS bucketed (the round-12 shuffle-free claim rests on
    # it): both tables report the declared bucket spec
    for tbl, col in ((t_pfx, "tok"), (t_tg, "doc_id")):
        ddl = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
        info = {r.col_name: r.data_type for r in ddl}
        assert info.get("Num Buckets") == str(dq._pf_index_buckets(SF)), tbl
        assert col in info.get("Bucket Columns", ""), tbl


def test_prefix_pairs_twin_identity(spark):
    assert _rows(dq.q263_prefix_pairs_materialized(spark, SF)) == _rows(
        dq.q259_prefix_pairs_capped(spark, SF)
    )


def test_prefix_report_twin_identity(spark):
    assert _rows(dq.q264_prefix_report_materialized(spark, SF)) == _rows(
        dq.q260_prefix_posting_report(spark, SF)
    )


def test_incremental_cc_twin_identity(spark):
    assert _rows(
        dq.q262_incremental_components_materialized(spark, SF)
    ) == _rows(dq.q157_incremental_components(spark, SF))


# Round-12 twin: the embedding near-dup graph (q66's watch item).


def test_embedding_cc_twin_identity(spark):
    from retail_sales_etl_pipeline_spark.plans import similarity_queries as sq

    sq._EMB_PAIRS_CACHE.clear()
    p1 = sq.materialize_embedding_pairs(spark, SF)
    p2 = sq.materialize_embedding_pairs(spark, SF)
    assert p1 == p2  # once per (session, corpus)
    assert _rows(
        sq.q271_embedding_components_materialized(spark, SF)
    ) == _rows(sq.q66_embedding_neardup_components(spark, SF))


def test_single_dag_cutover_is_lossless(spark, monkeypatch):
    """Force the checkpoint cutover (PF_SINGLE_DAG_MAX_DOCS below the test
    corpus) and pin that the self-contained plan's output is row-identical
    to the in-DAG form — the at-scale path is exercised at test scale."""
    dq._PF_INDEX_CACHE.clear()
    want = _rows(dq.q259_prefix_pairs_capped(spark, SF))
    monkeypatch.setattr(dq, "PF_SINGLE_DAG_MAX_DOCS", 1)
    dq._PF_INDEX_CACHE.clear()
    got = _rows(dq.q259_prefix_pairs_capped(spark, SF))
    assert got == want
    # and the exact judge takes the same cutover losslessly
    want_exact = None
    monkeypatch.setattr(dq, "PF_SINGLE_DAG_MAX_DOCS", 10**9)
    dq._PF_INDEX_CACHE.clear()
    want_exact = _rows(dq.q205_prefix_filter_pairs(spark, SF))
    monkeypatch.setattr(dq, "PF_SINGLE_DAG_MAX_DOCS", 1)
    dq._PF_INDEX_CACHE.clear()
    assert _rows(dq.q205_prefix_filter_pairs(spark, SF)) == want_exact


def test_pf_index_buckets_adaptive(monkeypatch, tmp_path):
    """Round-13: the bucket count follows corpus bytes (8 at test scale,
    power-of-two growth, 1024 cap), falls back to the conservative
    default when the size is unknowable (remote URI), and honors the
    operator override env."""
    monkeypatch.delenv("SPARK_GRAFT_PF_BUCKETS", raising=False)
    assert dq._pf_index_buckets("/root/testdata/sf0.001") == 8
    assert dq._pf_index_buckets("s3://bucket/corpus") == dq.PF_INDEX_BUCKETS
    # synthetic size ladder: 8 doubles per PF_BUCKET_TARGET_BYTES step
    import os

    big = tmp_path / "documents.parquet"
    big.write_bytes(b"x")  # 1 byte -> floor
    assert dq._pf_index_buckets(str(tmp_path)) == 8
    monkeypatch.setenv("SPARK_GRAFT_PF_BUCKETS", "128")
    assert dq._pf_index_buckets(str(tmp_path)) == 128


def test_prefix_index_survives_stale_warehouse_location(spark):
    """Fresh-process simulation: deterministic table names + a warehouse
    directory left behind by a PREVIOUS process (catalog empty, location
    present) must not kill the materialized plans — saveAsTable alone
    dies with LOCATION_ALREADY_EXISTS in exactly that state (measured:
    first post-build fresh-session q263 run)."""
    import os
    import re

    dq._PF_INDEX_CACHE.clear()
    t_pfx, t_tg = dq.materialize_prefix_index(spark, SF)
    want = _rows(spark.table(t_pfx))

    # Recreate the fresh-process state: catalog entry gone, orphan
    # directory at the managed location.
    wh = spark.conf.get("spark.sql.warehouse.dir")
    local = re.match(r"^file:/{0,2}(/.*)$", wh).group(1)
    for t in (t_pfx, t_tg):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        os.makedirs(os.path.join(local, t), exist_ok=True)
        with open(os.path.join(local, t, "stale-part"), "w") as f:
            f.write("leftover from a previous process")
    dq._PF_INDEX_CACHE.clear()

    got_t = dq.materialize_prefix_index(spark, SF)
    assert got_t == (t_pfx, t_tg)
    assert _rows(spark.table(t_pfx)) == want
