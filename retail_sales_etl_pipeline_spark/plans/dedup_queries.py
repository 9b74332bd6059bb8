"""Deduplication queries over the `documents` table.

The dedup ladder every large-scale training-data pipeline needs, cheapest
first:

1. exact — hash-groupBy on content (q20): one shuffle on a 64-hex key.
2. near-dup candidates — MinHash+LSH (q22): shingle → minhash → band →
   bucket-join. The band equi-join is the scale path: candidates come from
   hash-partition-local equality, never an all-pairs comparison.
3. exact verification — token-trigram Jaccard (q21): quadratic, so it runs
   only within blocking groups (language) here, and in production only on
   LSH candidate pairs.
4. SimHash fingerprints (q23): constant-size per-doc signature; hamming
   distance on a 16-bit int.

Every hash is an explicit polynomial over character codes, so DuckDB
computes identical integers — these queries are fully oracle-checked, not
rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    MINHASH_BANDS,
    MINHASH_PERMS,
    minhash_sig_expr,
    simhash_expr,
    token_ngrams_expr,
)
from ..sources import load_table
from .registry import register


@register(
    "q20_dedup_exact",
    oracle="""
    SELECT sha256(text) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
    doc="Exact dedup: group by content hash, keep the smallest doc_id. "
    "At 100 TB the 64-hex key shuffles instead of the document bodies; "
    "W1's window dedup generalized to content identity.",
    tags=("dedup",),
)
def q20_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _ngram_jaccard_sql() -> tuple[str, str]:
    tg_spark, tg_duck = token_ngrams_expr("text", 3)
    return tg_spark, tg_duck


@register(
    "q21_ngram_jaccard_pairs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, {_ngram_jaccard_sql()[1]} AS tg
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.tg, b.tg)) AS DOUBLE)
             / CAST(len(list_distinct(a.tg || b.tg)) AS DOUBLE) AS jaccard
    FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.tg, b.tg)) AS DOUBLE)
             / CAST(len(list_distinct(a.tg || b.tg)) AS DOUBLE) >= 0.3
    """,
    doc="Exact token-trigram Jaccard near-dup pairs within language blocks. "
    "The block equi-join (lang) bounds the pair explosion; production runs "
    "this only on LSH candidates (q22). Jaccard = |intersect|/|union| of "
    "distinct trigram sets — int sizes, so the double division is "
    "bit-deterministic across engines.",
    tags=("dedup", "join"),
)
def q21_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tg_spark, _ = _ngram_jaccard_sql()
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(F.split("text", " ")) >= 3)
        .select("doc_id", "lang", F.expr(tg_spark).alias("tg"))
    )
    a, b = docs.alias("a"), docs.alias("b")
    jac = (
        F.size(F.array_intersect(F.col("a.tg"), F.col("b.tg"))).cast("double")
        / F.size(F.array_union(F.col("a.tg"), F.col("b.tg"))).cast("double")
    )
    return (
        a.join(b, (F.col("a.lang") == F.col("b.lang")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.3)
    )


def _minhash_band_cols() -> tuple[list[str], list[str]]:
    """Band-signature strings: concat of rows-per-band minhash values."""
    spark_sigs, duck_sigs = minhash_sig_expr("text", 5)
    rows = len(MINHASH_PERMS) // MINHASH_BANDS
    spark_bands, duck_bands = [], []
    for b in range(MINHASH_BANDS):
        chunk_s = spark_sigs[b * rows : (b + 1) * rows]
        chunk_d = duck_sigs[b * rows : (b + 1) * rows]
        spark_bands.append("concat_ws('-', " + ", ".join(chunk_s) + ")")
        duck_bands.append(" || '-' || ".join(f"({e})" for e in chunk_d))
    return spark_bands, duck_bands


_SPARK_BANDS, _DUCK_BANDS = _minhash_band_cols()

_DUCK_MINHASH_ORACLE = f"""
    WITH sigs AS (
      SELECT doc_id,
             {", ".join(f"{e} AS band{i}" for i, e in enumerate(_DUCK_BANDS))}
      FROM documents
    ),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {i} AS band_idx, band{i} AS sig FROM sigs" for i in range(MINHASH_BANDS))}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_bands
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.sig = b.sig AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
"""


@register(
    "q22_minhash_lsh_candidates",
    oracle=_DUCK_MINHASH_ORACLE,
    doc="MinHash-LSH near-dup candidates: 16 affine permutations over "
    "char-5-shingle polynomial hashes, banded 4x4; docs sharing any band "
    "signature become candidates. The unpivot+equi-join shape shuffles "
    "(band_idx, sig) keys only — no all-pairs scan, which is what makes "
    "near-dedup feasible at 100 TB. Oracle-checked exactly because the "
    "permutation hashes are explicit integer arithmetic.",
    tags=("dedup", "lsh"),
)
def q22_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sigs = docs.select(
        "doc_id",
        *[F.expr(e).alias(f"band{i}") for i, e in enumerate(_SPARK_BANDS)],
    )
    # unpivot to (doc_id, band_idx, sig)
    bands = sigs.selectExpr(
        "doc_id",
        f"stack({MINHASH_BANDS}, "
        + ", ".join(f"{i}, band{i}" for i in range(MINHASH_BANDS))
        + ") AS (band_idx, sig)",
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


_SIMHASH_SPARK, _SIMHASH_DUCK = simhash_expr("text", 16)


@register(
    "q23_simhash",
    oracle=f"""
    SELECT doc_id, CAST({_SIMHASH_DUCK} AS BIGINT) AS simhash
    FROM documents
    """,
    doc="SimHash fingerprints: 16-bit sign-aggregate of token polynomial "
    "hashes. Constant-size signature per doc; near-dup = small hamming "
    "distance (bit_count(xor)) — a cheap pairwise check that, unlike "
    "MinHash, preserves similarity in a single integer.",
    tags=("dedup",),
)
def q23_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.expr(_SIMHASH_SPARK).cast("long").alias("simhash"))
