"""Value checks for q87 (prototypicality pruning) and q88 (unigram
surprisal).

q87 is hash-checked by the DuckDB oracle; here numpy independently
recomputes assignment, ranking, and the prune flag (a third
implementation, so a shared dialect quirk can't hide).

q88 is hash-checked by its DuckDB oracle in integer micro-nat fixed
point (the q105 pattern); this test independently recomputes the TRUE
float log-loss in DuckDB with its own ln() and asserts the fixed-point
mean sits within the provable rounding bound (per-token quantization
<= 1e-6 nat for each of the two L() terms, plus <= 1e-6 integer-div
truncation of the mean => atol 3e-6 nat), plus the semantic properties
banding relies on.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from retail_sales_etl_pipeline_spark.plans.similarity_queries import (
    N_CENTROIDS,
    PRUNE_KEEP_DEN,
    q87_prototypicality_pruning,
)
from retail_sales_etl_pipeline_spark.plans.text_queries import q88_unigram_surprisal

SF = "/root/testdata/sf0.001"


def test_prototypicality_matches_numpy(spark):
    rows = q87_prototypicality_pruning(spark, SF).collect()
    assert rows

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    cents = {i: emb[i] for i in range(N_CENTROIDS)}

    def cos(a, b):
        # index-ordered fold like the engine: np.dot is close enough for
        # assignment/ranking checks (ties broken by id, not by ulp)
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    assign = {}
    for vid, v in emb.items():
        scored = sorted(
            ((cos(v, c), -cid) for cid, c in cents.items()), reverse=True
        )
        best_cos, neg_cid = scored[0]
        assign[vid] = (-neg_cid, best_cos)

    by_cluster: dict[int, list[tuple[float, int]]] = {}
    for vid, (cid, c) in assign.items():
        by_cluster.setdefault(cid, []).append((c, vid))

    got = {r.vec_id: r for r in rows}
    assert set(got) == set(emb)
    for cid, members in by_cluster.items():
        members.sort(key=lambda t: (-t[0], t[1]))
        n = len(members)
        n_pruned_expected = -(-n // PRUNE_KEEP_DEN)  # ceil(n/den)
        n_pruned_got = 0
        for rank0, (c, vid) in enumerate(members):
            r = got[vid]
            assert r.centroid_id == cid, f"vec {vid} assignment differs"
            assert r.proto_rank == rank0 + 1
            assert r.cos_c == pytest.approx(c, rel=1e-9)
            n_pruned_got += bool(r.pruned)
            assert r.pruned == ((rank0) * PRUNE_KEEP_DEN < n)
        assert n_pruned_got == n_pruned_expected


def test_unigram_surprisal_matches_duckdb_ln(spark):
    got = {
        r.doc_id: (r.n_tokens, r.mean_surprisal_micronat / 1e6)
        for r in q88_unigram_surprisal(spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(
        """
        WITH tok AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
          FROM documents
        ),
        counts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
        total AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_total FROM counts)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               AVG(ln(n_total / cnt)) AS s
        FROM tok JOIN counts USING (token) CROSS JOIN total
        GROUP BY doc_id
        """
    ).fetchall()
    want = {r[0]: (r[1], r[2]) for r in want}
    assert set(got) == set(want)
    for did, (n, s) in want.items():
        gn, gs = got[did]
        assert gn == n
        assert gs == pytest.approx(s, abs=3e-6)

    # semantic sanity: surprisal is positive and bounded by the rarest
    # token's surprisal; a doc made of the most common token would sit at
    # the minimum — orderable, which is all banding needs
    svals = [s for _, s in got.values()]
    assert min(svals) > 0
    assert max(svals) < 20  # ln of corpus scale, sane ceiling
