"""Bloom-filter approximate pre-filter for the dedup ladder.

At 100 TB the exact-dedup anti-join (new batch vs existing corpus) shuffles
every key of BOTH sides. A bloom pre-filter removes that for the common
case: rows whose key misses ANY bloom position are *definitely new* (bloom
filters have no false negatives) and skip the expensive exact verification
entirely; only probable-duplicate candidates — a small, fpp-bounded
fraction — continue to the exact anti-join.

Two equivalent physical forms, both implemented:

1. **positions-set join** (`bloom_prefilter_new`): the filter is the
   DISTINCT set of bit positions of the corpus keys; membership is a
   broadcast equi-join on position. Every step is plain relational algebra
   over explicit integer hashes, so a SQL oracle reproduces it exactly —
   this form backs the registry query (q28).
2. **broadcast bitmap** (`bloom_bitmap_build` / `bloom_bitmap_filter`): the
   classic form — per-partition numpy bitmaps OR-merged to one m-bit array
   (m = 2^33 ≈ 1 GiB serves ~10^9 keys at fpp ≈ 2%), broadcast once, probed
   map-side with zero shuffle. Identical decisions to form 1 by
   construction (same hashes, same modulus) — asserted in tests.

Key hash: the polynomial content hash shared with the fingerprint/minhash
operators (functions.scalar.POLY_BASE/POLY_MOD), so one map pass can feed
every stage of the dedup ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import POLY_MOD

# K affine hash functions pos_i = (a_i*h + b_i) mod M over key hash h.
# a_i < 10^6 keeps a_i*h < 10^15 « 2^63 (same overflow headroom argument as
# MINHASH_PERMS); constants deliberately disjoint from the minhash set.
BLOOM_HASHES: list[tuple[int, int]] = [
    (562841, 174440041),
    (115249, 198491317),
    (784727, 217645177),
    (358079, 236887691),
]
BLOOM_M = 262139  # prime bit-space; ~fpp 2% at ~4k keys with K=4


def bloom_positions_pair(
    h_spark: str, h_duck: str, m: int = BLOOM_M
) -> tuple[str, str]:
    """Dialect-paired array-of-positions expressions for a key-hash expr.

    Positions use pmod semantics (always non-negative) in BOTH dialects so
    they agree with numpy's ``%`` in the bitmap form even for negative key
    hashes: Spark ``pmod``, DuckDB ``((x % m) + m) % m`` (its ``%`` follows
    the dividend's sign, like Spark's). For the poly-hash domain
    [0, POLY_MOD) all three were already identical; this closes the
    disagreement for out-of-domain callers. a*h stays < 1e6 * POLY_MOD
    ≈ 1e15 « 2^63, so the int64 arithmetic cannot overflow on-domain —
    the bitmap helpers assert the domain (numpy's a*h WOULD overflow
    silently for |h| ≳ 1e13)."""
    spark = (
        "array("
        + ", ".join(f"pmod({a}L * {h_spark} + {b}L, {m})" for a, b in BLOOM_HASHES)
        + ")"
    )
    duck = (
        "["
        + ", ".join(
            f"((({a} * {h_duck} + {b}) % {m}) + {m}) % {m}" for a, b in BLOOM_HASHES
        )
        + "]"
    )
    return spark, duck


def bloom_bits(corpus_keys: DataFrame, key_col: str = "key_hash", m: int = BLOOM_M) -> DataFrame:
    """The filter as a relation: DISTINCT bit positions of the corpus keys.
    At most min(|corpus|*K, m) small ints — broadcastable by construction
    when m is broadcast-sized."""
    pos_expr = bloom_positions_pair(key_col, key_col, m)[0]
    return (
        corpus_keys.select(F.explode(F.expr(pos_expr)).alias("pos")).distinct()
    )


def bloom_prefilter_new(
    batch_keys: DataFrame,
    corpus_keys: DataFrame,
    key_col: str = "key_hash",
    m: int = BLOOM_M,
) -> DataFrame:
    """Rows of ``batch_keys`` that are NEW vs the corpus, with the bloom
    stage doing the heavy lifting:

    - definite-new: any bloom position missing → emitted with
      ``bloom_candidate = false``, NO exact check needed (no false
      negatives).
    - candidates: all positions present → exact anti-join on the key hash;
      survivors emitted with ``bloom_candidate = true`` (they were false
      positives of the filter).

    Result set == plain exact anti-join, proven in tests with an
    undersized ``m`` that forces false positives. Input contract: batch
    rows are distinct (the groupBy re-assembling the K probe rows per key
    would collapse byte-identical duplicates — upstream exact dedup is the
    ladder rung that owns those). A NULL key hash is handled like
    left_anti handles it — kept as definite-new (``explode_outer``; its
    NULL positions never match the filter).
    """
    pos_expr = bloom_positions_pair(key_col, key_col, m)[0]
    bits = F.broadcast(bloom_bits(corpus_keys, key_col, m))
    bp = batch_keys.select(
        *batch_keys.columns, F.explode_outer(F.expr(pos_expr)).alias("pos")
    )
    # ONE pass over the batch keys: left-join the (broadcast) filter and
    # fold the K per-key probes with bool_and — candidate iff every
    # position hit. (Deriving definite/candidate rows as two separate
    # anti-join branches would re-execute the upstream key computation.)
    probed = (
        bp.join(bits.withColumn("_hit", F.lit(True)), "pos", "left")
        .groupBy(*batch_keys.columns)
        .agg(F.bool_and(F.coalesce(F.col("_hit"), F.lit(False))).alias("bloom_candidate"))
    )
    # verification folded into the same linear plan (one more left join +
    # filter, never a second branch): keep non-candidates outright, and
    # candidates only when the exact key lookup finds no corpus match.
    dup_keys = corpus_keys.select(key_col).distinct().withColumn("_dup", F.lit(True))
    return (
        probed.join(dup_keys, key_col, "left")
        .filter(~F.col("bloom_candidate") | F.col("_dup").isNull())
        .select(*batch_keys.columns, "bloom_candidate")
    )


# --- broadcast-bitmap physical form ----------------------------------------


def bloom_bitmap_build(
    corpus_keys: DataFrame, key_col: str = "key_hash", m: int = BLOOM_M
) -> bytes:
    """Build the m-bit filter: each partition ORs its keys into a numpy
    bitmap (m/8 bytes) and emits it once; the driver ORs the per-partition
    bitmaps. Shuffle-free; driver receives n_partitions * m/8 bytes."""
    import numpy as np

    hashes, mod, poly_mod = list(BLOOM_HASHES), m, POLY_MOD
    n_bytes = (m + 7) // 8

    def per_partition(batches):
        import numpy as np
        import pandas as pd

        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if pdf.empty:
                continue
            seen = True
            h = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            # numpy a*h overflows int64 silently for |h| >= ~1e13; the
            # poly-hash domain [0, POLY_MOD) is the supported input.
            if h.min() < 0 or h.max() >= poly_mod:
                raise ValueError("bloom bitmap: key_hash outside [0, POLY_MOD)")
            for a, b in hashes:
                pos = (a * h + b) % mod
                np.bitwise_or.at(bitmap, pos // 8, np.uint8(1) << (pos % 8).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    parts = corpus_keys.select(key_col).mapInPandas(per_partition, "bitmap binary")
    acc = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts.collect():
        acc |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return acc.tobytes()


def bloom_bitmap_filter(
    batch_keys: DataFrame,
    bitmap: bytes,
    key_col: str = "key_hash",
    m: int = BLOOM_M,
    candidates: bool = True,
) -> DataFrame:
    """Map-side probe of the broadcast bitmap: keep candidate rows (all K
    bits set) when ``candidates``, else the definite-new rows. Zero
    shuffle; the bitmap ships once per executor in the task closure (use
    ``spark.sparkContext.broadcast`` for very large m)."""
    hashes, mod, poly_mod = list(BLOOM_HASHES), m, POLY_MOD
    schema = batch_keys.schema

    def per_batch(batches):
        import numpy as np

        bm = np.frombuffer(bitmap, dtype=np.uint8)
        for pdf in batches:
            if pdf.empty:
                continue
            h = pdf[key_col].to_numpy(dtype=np.int64)
            if h.min() < 0 or h.max() >= poly_mod:
                raise ValueError("bloom bitmap: key_hash outside [0, POLY_MOD)")
            hit = np.ones(len(h), dtype=bool)
            for a, b in hashes:
                pos = (a * h + b) % mod
                hit &= (bm[pos // 8] >> (pos % 8).astype(np.uint8)) & 1 == 1
            yield pdf[hit if candidates else ~hit]

    return batch_keys.mapInPandas(per_batch, schema)
