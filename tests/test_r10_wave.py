"""Round-10 wave: iterative BPE merge trainer (q256), fasttext-style
linear quality classifier (q257), MRR@k retrieval eval (q258), and the
capped prefix-filter all-pairs join (q259, q205's default-path twin).

Hash-parity with the DuckDB oracles is the primary gate; these tests pin
the VALUE semantics a hash can't explain: the merge fold against a
pure-Python reference BPE trainer (left-to-right non-overlapping
semantics, including the repeated-symbol runs that break naive regex
replacement), the hard-sigmoid classifier against a NumPy recount, the
MRR identity against brute force, and the capped join's recall
accounting against the exact q205 pair set.
"""

from __future__ import annotations

from collections import Counter

from retail_sales_etl_pipeline_spark.plans.registry import load_all
from retail_sales_etl_pipeline_spark.sources import load_table

from .conftest import ORACLE_SF_DIR, SMOKE_SF_DIR

REGISTRY = load_all()


# --- pure-Python reference BPE trainer --------------------------------------


def _ref_bpe(word_freq: dict[str, int], rounds: int):
    """Textbook BPE (Sennrich et al. 2016): greedy max-count pair with
    (count DESC, left ASC, right ASC) tie-break, merges applied
    left-to-right non-overlapping."""
    segs = {w: tuple(w) for w in word_freq}
    merges = []
    for rnd in range(1, rounds + 1):
        counts: Counter = Counter()
        for w, sym in segs.items():
            f = word_freq[w]
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] += f
        if not counts:
            break
        top = max(counts.values())
        best = min(p for p in counts if counts[p] == top)
        merges.append((rnd, best[0], best[1], best[0] + best[1], counts[best]))
        new_segs = {}
        for w, sym in segs.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_segs[w] = tuple(out)
        segs = new_segs
    return merges


def test_q256_matches_reference_trainer(spark):
    from retail_sales_etl_pipeline_spark.plans.tokenizer_queries import (
        BPE_ROUNDS,
    )

    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    wf: Counter = Counter()
    for r in docs.select("text").collect():
        if r.text is None:
            continue
        for w in r.text.lower().split(" "):
            if w:
                wf[w] += 1
    expected = _ref_bpe(dict(wf), BPE_ROUNDS)
    got = [
        (r.round, r.left_sym, r.right_sym, r.merged, r.pair_cnt)
        for r in REGISTRY["q256_bpe_merge_trainer"]
        .spark_fn(spark, SMOKE_SF_DIR)
        .orderBy("round")
        .collect()
    ]
    assert got == expected


def test_bpe_fold_handles_repeated_symbol_runs(spark):
    """'a a a a' + merge (a,a) must give 'aa aa' (left-to-right
    non-overlap), the case that breaks padded-space regex replacement."""
    from retail_sales_etl_pipeline_spark.plans.tokenizer_queries import (
        BPE_SEP,
        _bpe_fold_pair,
    )

    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("aaaa",), ("aaa",), ("aab",), ("baa",), ("x",)], "w string"
    ).withColumn("seg", F.expr(f"concat_ws('{BPE_SEP}', split(w, ''))"))
    fold, _ = _bpe_fold_pair("a", "a")
    got = {
        r.w: r.seg2.split(BPE_SEP)
        for r in df.withColumn("seg2", F.expr(fold)).collect()
    }
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]
    assert got["aab"] == ["aa", "b"]
    assert got["baa"] == ["b", "aa"]
    assert got["x"] == ["x"]


# --- fasttext-style classifier (q257) ---------------------------------------


def _poly_hash(s: str, base: int = 31, mod: int = 1_000_000_007) -> int:
    h = 0
    for c in s:
        h = (h * base + ord(c)) % mod
    return h


def test_q257_matches_python_recount(spark):
    from retail_sales_etl_pipeline_spark.plans.text_queries import (
        FT_BUCKETS,
        FT_KNUTH,
    )

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SMOKE_SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
        if r.text is not None
    }
    expected = {}
    for did, text in docs.items():
        n = s = 0
        for w in text.lower().split(" "):
            if not w:
                continue
            p = f"<{w}>"
            for i in range(len(p) - 2):
                b = _poly_hash(p[i : i + 3]) % FT_BUCKETS
                s += ((b * FT_KNUTH) % 4294967296) % 2001 - 1000
                n += 1
        if n:
            avg = abs(s) // n * (1 if s >= 0 else -1)  # trunc toward 0
            sig = min(1_000_000, max(0, 500_000 + 250 * avg))
            expected[did] = (n, s, avg, sig, int(sig >= 500_000))
    got = {
        r.doc_id: (
            r.n_grams,
            r.score_sum_milli,
            r.score_avg_milli,
            r.sigmoid_ppm,
            r.keep,
        )
        for r in REGISTRY["q257_fasttext_quality_score"]
        .spark_fn(spark, SMOKE_SF_DIR)
        .collect()
    }
    assert got == expected


# --- MRR@k (q258) ------------------------------------------------------------


def test_q258_matches_brute_force(spark):
    from retail_sales_etl_pipeline_spark.plans.similarity_queries import (
        N_QUERIES,
        NDCG_K,
    )

    rows = (
        load_table(spark, SMOKE_SF_DIR, "embeddings")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    vecs = {r.vec_id: ([float(x) for x in r.embedding], r.label) for r in rows}

    def dot(a, b):  # left-associated fold, the engine's summation order
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    import math

    nrm = {k: math.sqrt(dot(v[0], v[0])) for k, v in vecs.items()}
    expected = {}
    rrs = []
    for q in sorted(vecs):
        if q >= N_QUERIES:
            continue
        scored = sorted(
            (
                (-(dot(vecs[q][0], vecs[b][0]) / (nrm[q] * nrm[b])), b)
                for b in vecs
                if b != q
            ),
        )[:NDCG_K]
        first = 0
        for i, (_, b) in enumerate(scored, start=1):
            if vecs[b][1] == vecs[q][1]:
                first = i
                break
        rr = 1_000_000 // first if first else 0
        expected[q] = (first, rr)
        rrs.append(rr)
    mrr = sum(rrs) // len(rrs)
    got = {
        r.query_id: (r.first_rel_rank, r.rr_ppm, r.mrr_ppm)
        for r in REGISTRY["q258_mrr_eval"].spark_fn(spark, SMOKE_SF_DIR).collect()
    }
    assert got == {q: (f, r, mrr) for q, (f, r) in expected.items()}


# --- capped prefix-filter pairs (q259/q260) ----------------------------------


def test_q259_equals_exact_judge_at_test_scale(spark):
    """The cap is a measured no-op at test scale (longest posting list
    12 < 64), so the capped default must equal the exact judge
    pair-for-pair."""
    exact = {
        (r.doc_a, r.doc_b, r.n_inter, r.n_union, r.jacc_ppm)
        for r in REGISTRY["q205_prefix_filter_pairs"]
        .spark_fn(spark, ORACLE_SF_DIR)
        .collect()
    }
    capped = {
        (r.doc_a, r.doc_b, r.n_inter, r.n_union, r.jacc_ppm)
        for r in REGISTRY["q259_prefix_pairs_capped"]
        .spark_fn(spark, ORACLE_SF_DIR)
        .collect()
    }
    assert capped == exact and exact


def test_q260_posting_report_accounting(spark):
    from retail_sales_etl_pipeline_spark.plans.dedup_queries import (
        PF_MAX_POSTING,
    )

    rows = (
        REGISTRY["q260_prefix_posting_report"]
        .spark_fn(spark, ORACLE_SF_DIR)
        .collect()
    )
    assert rows
    for r in rows:
        if r.plen_bucket <= PF_MAX_POSTING:
            # exact buckets: nothing dropped, entries = bucket * tokens,
            # bound = tokens * C(bucket, 2)
            assert r.n_tokens_dropped == 0 and r.n_entries_dropped == 0
            assert r.n_entries == r.plen_bucket * r.n_tokens
            assert (
                r.cand_pairs_bound
                == r.n_tokens * r.plen_bucket * (r.plen_bucket - 1) // 2
            )
        else:
            # tail bucket: everything in it is dropped
            assert r.n_tokens_dropped == r.n_tokens
            assert r.n_entries_dropped == r.n_entries


# --- BPE encode report (q261) -------------------------------------------------


def test_q261_totals_reconcile_with_corpus(spark):
    rows = (
        REGISTRY["q261_bpe_encode_report"]
        .spark_fn(spark, SMOKE_SF_DIR)
        .orderBy("rnk")
        .collect()
    )
    assert rows
    # totals identical on every row; head ordered by (w_cnt desc, token)
    assert len({(r.n_tokens_total, r.n_chars_total, r.n_token_types) for r in rows}) == 1
    keys = [(-r.w_cnt, r.token) for r in rows]
    assert keys == sorted(keys)
    # chars never grow, tokens never exceed chars (merges only shrink)
    r0 = rows[0]
    assert 0 < r0.n_tokens_total <= r0.n_chars_total
    # corpus-truth chars: weighted char count of the word stream
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    chars = 0
    for r in docs.select("text").collect():
        if r.text is None:
            continue
        chars += sum(len(w) for w in r.text.lower().split(" ") if w)
    assert r0.n_chars_total == chars
    assert (
        r0.tokens_per_char_ppm
        == 1_000_000 * r0.n_tokens_total // r0.n_chars_total
    )
