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
