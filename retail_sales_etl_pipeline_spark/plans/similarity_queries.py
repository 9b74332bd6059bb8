"""Similarity-search queries over the `embeddings` table (64-dim float
vectors). Brute-force exact top-k as the baseline; IVF cluster probing and
random-projection LSH as the scale paths. All three are oracle-checked
exactly: dot products are index-ordered double sums, bit-identical between
Spark's aggregate(zip_with(...)) and DuckDB's list_dot_product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    RP_MAX_BUCKET,
    RP_TABLES,
    dot_pair,
    norm_pair,
    rp_bucket_pair,
    rp_buckets_pandas,
)
from ..sources import load_table
from .registry import register

N_QUERIES = 5  # query set = vec_id < 5
TOP_K = 10
N_CENTROIDS = 16  # fixed K: centroids = vec_id < 16, independent of corpus size
NEARDUP_COS = 0.4

_DOT_S, _DOT_D = dot_pair("a.emb", "b.emb")
_NORM_S, _NORM_D = norm_pair("embedding")


def _vec_view_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
        F.expr(_NORM_S.replace("embedding", "embedding")).alias("nrm"),
    )


_DUCK_VEC_CTE = f"""
    SELECT vec_id, embedding::DOUBLE[] AS emb, {_NORM_D} AS nrm
    FROM embeddings
"""


def _ivf_scored(v: DataFrame) -> DataFrame:
    """(vec_id, centroid_id, cos_c) for every vector x broadcast centroid."""
    cents = v.filter(F.col("vec_id") < N_CENTROIDS)
    a, b = v.alias("a"), F.broadcast(cents).alias("b")
    cos = F.expr(_DOT_S) / (F.col("a.nrm") * F.col("b.nrm"))
    return a.join(b).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("centroid_id"),
        cos.alias("cos_c"),
    )


def _ivf_assign(scored: DataFrame) -> DataFrame:
    """Nearest-centroid argmax shared by q31/q52: max_by(struct(cos,
    -centroid_id)) — same survivor as the oracle's ORDER BY cos DESC,
    centroid_id ASC window, but with map-side partial aggregation instead
    of a full N*K window shuffle. Any change to this tie-break MUST stay
    mirrored in both queries' oracle SQL."""
    return scored.groupBy("vec_id").agg(
        F.max_by(
            F.col("centroid_id"),
            F.struct(F.col("cos_c").alias("c"), (-F.col("centroid_id")).alias("neg_id")),
        ).alias("centroid_id")
    )


@register(
    "q30_ann_bruteforce",
    oracle=f"""
    WITH v AS ({_DUCK_VEC_CTE})
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DOT_D} / (a.nrm * b.nrm) AS cosine,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY {_DOT_D} / (a.nrm * b.nrm) DESC, b.vec_id
             ) AS rnk
      FROM v a JOIN v b ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
    ) WHERE rnk <= {TOP_K}
    """,
    doc="Exact cosine top-k (brute force): the ANN baseline. O(N*Q) dots "
    "computed map-side; the only shuffle is the per-query top-k window "
    "over Q*N scored rows, which AQE keeps partition-local per query. "
    "For large Q use operators.similarity.brute_force_topk_pandas (Arrow "
    "matmul + partial top-k merge, verified equal in tests).",
    tags=("similarity",),
)
def q30_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    v = _vec_view_spark(spark, sf_dir)
    a = v.filter(F.col("vec_id") < N_QUERIES).alias("a")
    b = v.alias("b")
    cos = F.expr(_DOT_S) / (F.col("a.nrm") * F.col("b.nrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        a.join(b, F.col("b.vec_id") != F.col("a.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .withColumn("rank", F.col("rank").cast("int"))
    )


@register(
    "q31_ann_ivf",
    oracle=f"""
    WITH v AS ({_DUCK_VEC_CTE}),
    cents AS (SELECT * FROM v WHERE vec_id < {N_CENTROIDS}),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT a.vec_id, b.vec_id AS centroid_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {_DOT_D} / (a.nrm * b.nrm) DESC, b.vec_id
               ) AS rnk
        FROM v a JOIN cents b ON true
      ) WHERE rnk = 1
    )
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DOT_D} / (a.nrm * b.nrm) AS cosine,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY {_DOT_D} / (a.nrm * b.nrm) DESC, b.vec_id
             ) AS rnk
      FROM v a
      JOIN assign qa ON qa.vec_id = a.vec_id
      JOIN assign ba ON ba.centroid_id = qa.centroid_id AND ba.vec_id <> a.vec_id
      JOIN v b ON b.vec_id = ba.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ) WHERE rnk <= {TOP_K}
    """,
    doc=f"IVF-style approximate top-k: a FIXED set of K={N_CENTROIDS} "
    "centroids (deterministic sample: vec_id < K) is broadcast to assign "
    "every vector to its nearest centroid. Assignment is a broadcast join "
    "followed by a max_by group-by whose partial (map-side) aggregation "
    "collapses the N*K scored rows to N before any shuffle — no window "
    "sort over N*K rows, and K never grows with the corpus, so the "
    "broadcast and the O(N*K) map stage both survive a 100 TB scale-up. "
    "Each query then probes only its own cluster via a (centroid_id) "
    "equi-join — candidates shrink ~K-fold vs brute force. Same "
    "approximation computed by both engines, so exact hash parity.",
    tags=("similarity",),
)
def q31_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    v = _vec_view_spark(spark, sf_dir)
    assign = _ivf_assign(_ivf_scored(v))

    qa = assign.alias("qa")
    ba = assign.alias("ba")
    cand = (
        v.alias("a")
        .filter(F.col("a.vec_id") < N_QUERIES)
        .join(qa, F.col("qa.vec_id") == F.col("a.vec_id"))
        .join(
            ba,
            (F.col("ba.centroid_id") == F.col("qa.centroid_id"))
            & (F.col("ba.vec_id") != F.col("a.vec_id")),
        )
        .join(v.alias("b"), F.col("b.vec_id") == F.col("ba.vec_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            (F.expr(_DOT_S) / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .withColumn("rank", F.col("rank").cast("int"))
    )


N_PROBE = 2


@register(
    "q52_ann_ivf_nprobe",
    oracle=f"""
    WITH v AS ({_DUCK_VEC_CTE}),
    cents AS (SELECT * FROM v WHERE vec_id < {N_CENTROIDS}),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT a.vec_id, b.vec_id AS centroid_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {_DOT_D} / (a.nrm * b.nrm) DESC, b.vec_id
               ) AS rnk
        FROM v a JOIN cents b ON true
      ) WHERE rnk = 1
    ),
    qassign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT a.vec_id, b.vec_id AS centroid_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {_DOT_D} / (a.nrm * b.nrm) DESC, b.vec_id
               ) AS rnk
        FROM v a JOIN cents b ON a.vec_id < {N_QUERIES}
      ) WHERE rnk <= {N_PROBE}
    )
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DOT_D} / (a.nrm * b.nrm) AS cosine,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY {_DOT_D} / (a.nrm * b.nrm) DESC, b.vec_id
             ) AS rnk
      FROM v a
      JOIN qassign qa ON qa.vec_id = a.vec_id
      JOIN assign ba ON ba.centroid_id = qa.centroid_id AND ba.vec_id <> a.vec_id
      JOIN v b ON b.vec_id = ba.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ) WHERE rnk <= {TOP_K}
    """,
    doc=f"IVF with multi-cluster probing (nprobe={N_PROBE}): database "
    "vectors keep the shuffle-free max_by assignment of q31, while each "
    "QUERY fans out to its 2 nearest centroids — a per-query window over "
    "only Q*K rows (Q tiny), so the recall boost costs nothing at corpus "
    "scale. Candidates are then the union of the probed clusters; "
    "duplicate (query, neighbor) pairs cannot arise because each "
    "database vector belongs to exactly one cluster.",
    tags=("similarity",),
)
def q52_ann_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    v = _vec_view_spark(spark, sf_dir)
    scored = _ivf_scored(v)
    # database side: argmax via map-side partial max_by (the q31 shape)
    assign = _ivf_assign(scored)
    # query side: top-nprobe centroids; the window touches only Q*K rows
    wq = Window.partitionBy("vec_id").orderBy(F.desc("cos_c"), F.asc("centroid_id"))
    qassign = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= N_PROBE)
        .select("vec_id", "centroid_id")
    )

    qa, ba = qassign.alias("qa"), assign.alias("ba")
    cand = (
        v.alias("a")
        .filter(F.col("a.vec_id") < N_QUERIES)
        .join(qa, F.col("qa.vec_id") == F.col("a.vec_id"))
        .join(
            ba,
            (F.col("ba.centroid_id") == F.col("qa.centroid_id"))
            & (F.col("ba.vec_id") != F.col("a.vec_id")),
        )
        .join(v.alias("b"), F.col("b.vec_id") == F.col("ba.vec_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            (F.expr(_DOT_S) / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .withColumn("rank", F.col("rank").cast("int"))
    )


@register(
    "q38_kmeans_ivf_clusters",
    oracle=None,  # iterative algorithm: the declared rows-only case
    doc="Trained-IVF cluster profile: 5 Lloyd's iterations refine the "
    "q31 bootstrap centroids (operators.kmeans). Each iteration is one "
    "mapInPandas pass emitting <= k partial-sum rows per partition "
    "(map-side combine; shuffle volume independent of corpus size), with "
    "kilobyte centroids held on the driver between jobs — the MLlib "
    "pattern without its abstractions. Iterative = not SQL-expressible, "
    "so this entry is deliberately rows-only (k rows, fixed schema).",
    tags=("similarity", "iterative", "pandas-udf"),
)
def q38_kmeans_ivf_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmeans import kmeans_assign, kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, k=N_CENTROIDS, iters=5)
    return (
        kmeans_assign(emb, centroids)
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("sq_dist"), 4).alias("avg_sq_dist"),
        )
    )


_QUANT_LEVELS = 127  # symmetric int8


@register(
    "q39_embedding_quantization",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb,
             greatest(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))),
                      1e-30) / {_QUANT_LEVELS}.0 AS scale
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, emb, scale,
             list_transform(emb, x -> floor(x / scale + 0.5)) AS qv
      FROM v
    )
    SELECT vec_id, scale,
           CAST(list_sum(qv) AS BIGINT) AS qsum,
           round(list_dot_product(emb, qv)
                 / (sqrt(list_dot_product(emb, emb))
                    * sqrt(list_dot_product(qv, qv))), 4) AS recon_cos
    FROM q
    """,
    doc=f"Symmetric int8 embedding quantization (4x storage/bandwidth cut "
    f"for ANN): per-vector scale = max|x|/{_QUANT_LEVELS}, levels = "
    f"floor(x/scale + 0.5) — floor instead of round because both engines "
    f"define floor identically while round's half-rule differs. Scale "
    f"cancels in cosine, so reconstruction quality is the cosine between "
    f"the raw vector and its integer levels (rounded 4dp for the "
    f"interpolation ulp). All per-row arithmetic: map-side, no shuffle.",
    tags=("similarity", "quantization"),
)
def q39_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS emb",
        f"greatest(array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))), "
        f"1e-30D) / {_QUANT_LEVELS}.0D AS scale",
    )
    q = v.selectExpr(
        "vec_id",
        "emb",
        "scale",
        # Spark floor(double) -> BIGINT; keep doubles for the dot products
        "transform(emb, x -> CAST(floor(x / scale + 0.5) AS DOUBLE)) AS qv",
    )
    return q.selectExpr(
        "vec_id",
        "scale",
        "CAST(aggregate(qv, 0.0D, (acc, x) -> acc + x) AS BIGINT) AS qsum",
        "round(aggregate(zip_with(emb, qv, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) "
        "/ (sqrt(aggregate(zip_with(emb, emb, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)) "
        "* sqrt(aggregate(zip_with(qv, qv, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v))), 4) "
        "AS recon_cos",
    )


_RP_SPARK = [rp_bucket_pair("emb", t)[0] for t in range(RP_TABLES)]
_RP_DUCK = [rp_bucket_pair("emb", t)[1] for t in range(RP_TABLES)]


@register(
    "q32_rp_lsh_neardup",
    oracle=f"""
    WITH v AS ({_DUCK_VEC_CTE}),
    buckets AS (
      {" UNION ALL ".join(
          f"SELECT vec_id, emb, nrm, {t} AS tbl, ({e}) AS bucket FROM v"
          for t, e in enumerate(_RP_DUCK)
      )}
    ),
    okbuckets AS (
      SELECT vec_id, tbl, bucket FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY tbl, bucket) AS bucket_n
        FROM buckets
      ) WHERE bucket_n <= {RP_MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM okbuckets a JOIN okbuckets b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b, {_DOT_D} / (a.nrm * b.nrm) AS cosine
    FROM cand c JOIN v a ON a.vec_id = c.vec_a JOIN v b ON b.vec_id = c.vec_b
    WHERE {_DOT_D} / (a.nrm * b.nrm) >= {NEARDUP_COS}
    """,
    doc=f"Embedding near-dup pairs via random-projection LSH: {RP_TABLES} "
    f"tables of sign-bit buckets from fixed integer hyperplanes; candidate "
    f"pairs come from (table, bucket) equality — never an all-pairs scan — "
    f"with buckets above {RP_MAX_BUCKET} members dropped before pairing "
    f"(hot-bucket cap, mirrored in the oracle; q59 reports the drops), "
    f"then exact cosine >= {NEARDUP_COS} verification. Buckets are computed "
    f"by the Arrow/numpy twin (operators.similarity.rp_buckets_pandas) with "
    f"fold-order-exact accumulation, so DuckDB reproduces them bit-for-bit; "
    f"the pure-SQL expression path (rp_bucket_pair) is kept and "
    f"equality-tested against the Arrow path in tests.",
    tags=("similarity", "dedup", "lsh"),
)
def q32_rp_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return rp_neardup_pairs(emb)


def rp_neardup_pairs(
    emb: DataFrame, max_bucket: int = RP_MAX_BUCKET, min_cos: float = NEARDUP_COS
) -> DataFrame:
    """q32's body as a reusable operator (parameterized cap for tests).
    The bucket count is a window over (tbl, bucket) — the self-join's own
    shuffle key — so capping costs one co-partitioned pass."""
    v = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
        F.expr(_NORM_S.replace("embedding", "embedding")).alias("nrm"),
    )
    from pyspark.sql import Window

    buckets = rp_buckets_pandas(emb)
    w = Window.partitionBy("tbl", "bucket")
    ok = (
        buckets.withColumn("bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("bucket_n") <= max_bucket)
        .drop("bucket_n")
    )
    a, b = ok.alias("ba"), ok.alias("bb")
    cand = (
        a.join(
            b,
            (F.col("ba.tbl") == F.col("bb.tbl"))
            & (F.col("ba.bucket") == F.col("bb.bucket"))
            & (F.col("ba.vec_id") < F.col("bb.vec_id")),
        )
        .select(
            F.col("ba.vec_id").alias("vec_a"), F.col("bb.vec_id").alias("vec_b")
        )
        .distinct()
    )
    av, bv = v.alias("a"), v.alias("b")
    cos = F.expr(_DOT_S) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        cand.join(av, F.col("a.vec_id") == F.col("vec_a"))
        .join(bv, F.col("b.vec_id") == F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= min_cos)
    )
