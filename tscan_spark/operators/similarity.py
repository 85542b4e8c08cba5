"""Embedding similarity search (approximate-nearest-neighbor family).

Over the ``embeddings`` table (vec_id, embedding: array<float>, label):

- :func:`brute_force_topk` — exact cosine top-k for a query subset.
  The dot products are *fixed-point integer sums* per dimension
  (round(x*y*1e12) summed as int64), so results are bit-identical across
  engines and partitionings — no float-reduction-order sensitivity.
  At scale this is the baseline: queries broadcast, one pass over the
  corpus, top-k via per-query window.
- :func:`lsh_bucket_topk` — the scale path: sign-bit bucketing on fixed
  dimensions (a deterministic random-hyperplane degenerate); candidates
  only meet within their bucket, turning the all-pairs crossJoin into a
  bucket-local join. Same exact cosine on the candidates.

Both return (q_id, vec_id, rank, cosine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import corpus

N_QUERIES = 8  # vec_id < N_QUERIES form the query set
TOP_K = 5
FP12 = 1_000_000_000_000  # 1e12 fixed-point scale for products
SIGN_DIMS = [1, 8, 21, 34]  # bucket = sign bits of these dims (1-based)


def _fp_dot(a: Column, b: Column) -> Column:
    """Exact int64 fixed-point dot product of two float arrays."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.round(x.cast("double") * y.cast("double") * FP12, 0).cast("long"),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn("norm_fp", _fp_dot(F.col("embedding"), F.col("embedding")))


def _cosine() -> Column:
    dot = F.col("dot_fp") / F.lit(float(FP12))
    na = F.sqrt(F.col("norm_a") / F.lit(float(FP12)))
    nb = F.sqrt(F.col("norm_b") / F.lit(float(FP12)))
    return F.round(dot / (na * nb), 6)


def brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast query vectors against the corpus."""
    emb = _with_norm(corpus.load(spark, sf_dir, "embeddings"))
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm_fp").alias("norm_a"),
    )
    pairs = emb.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("q_id"))
    pairs = pairs.select(
        "q_id",
        "vec_id",
        "norm_a",
        F.col("norm_fp").alias("norm_b"),
        _fp_dot(F.col("q_emb"), F.col("embedding")).alias("dot_fp"),
    ).withColumn("cosine", _cosine())
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", F.col("rank").cast("int").alias("rank"), "cosine")
    )


_SQL_FP_DOT = (
    "SUM(CAST(ROUND(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)"
    f" * {FP12}, 0) AS BIGINT))"
)


def _sql_norms_cte() -> str:
    return f"""
norms AS (
    SELECT a.vec_id,
           SUM(CAST(ROUND(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)
               * {FP12}, 0) AS BIGINT)) AS norm_fp
    FROM embeddings a CROSS JOIN range(1, 65) r(i)
    GROUP BY a.vec_id
)"""


def sql_brute_force_topk() -> str:
    return f"""
WITH {_sql_norms_cte().strip()},
dots AS (
    SELECT b.vec_id AS q_id, a.vec_id,
           {_SQL_FP_DOT} AS dot_fp
    FROM embeddings a
    CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) b
    CROSS JOIN range(1, 65) r(i)
    WHERE a.vec_id <> b.vec_id
    GROUP BY b.vec_id, a.vec_id
),
scored AS (
    SELECT dots.q_id, dots.vec_id,
           ROUND((dot_fp / {float(FP12)})
                 / (sqrt(na.norm_fp / {float(FP12)}) * sqrt(nb.norm_fp / {float(FP12)})),
                 6) AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = dots.q_id
    JOIN norms nb ON nb.vec_id = dots.vec_id
),
ranked AS (
    SELECT q_id, vec_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank,
           cosine
    FROM scored
)
SELECT q_id, vec_id, rank, cosine FROM ranked WHERE rank <= {TOP_K}"""


def _bucket(emb: Column) -> Column:
    """Deterministic sign-bit bucket over fixed dimensions."""
    b = F.lit(0)
    for k, d in enumerate(SIGN_DIMS):
        b = b + F.when(F.element_at(emb, d) > 0, F.lit(2**k)).otherwise(0)
    return b.cast("int")


def lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: sign-bit LSH buckets, exact cosine within bucket.

    The corpus-side join key is the bucket id, so the pair space shrinks
    ~2^|SIGN_DIMS|x; recall is partial by design (ANN) but deterministic.
    """
    emb = _with_norm(corpus.load(spark, sf_dir, "embeddings")).withColumn(
        "bucket", _bucket(F.col("embedding"))
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm_fp").alias("norm_a"),
        "bucket",
    )
    pairs = emb.join(F.broadcast(q), "bucket").where(F.col("vec_id") != F.col("q_id"))
    pairs = pairs.select(
        "q_id",
        "vec_id",
        "norm_a",
        F.col("norm_fp").alias("norm_b"),
        _fp_dot(F.col("q_emb"), F.col("embedding")).alias("dot_fp"),
    ).withColumn("cosine", _cosine())
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", F.col("rank").cast("int").alias("rank"), "cosine")
    )


def sql_lsh_bucket_topk() -> str:
    bucket_sql = " + ".join(
        f"(CASE WHEN embedding[{d}] > 0 THEN {2**k} ELSE 0 END)"
        for k, d in enumerate(SIGN_DIMS)
    )
    return f"""
WITH {_sql_norms_cte().strip()},
bucketed AS (
    SELECT vec_id, embedding, CAST({bucket_sql} AS INT) AS bucket
    FROM embeddings
),
dots AS (
    SELECT b.vec_id AS q_id, a.vec_id,
           {_SQL_FP_DOT} AS dot_fp
    FROM bucketed a
    JOIN (SELECT * FROM bucketed WHERE vec_id < {N_QUERIES}) b USING (bucket)
    CROSS JOIN range(1, 65) r(i)
    WHERE a.vec_id <> b.vec_id
    GROUP BY b.vec_id, a.vec_id
),
scored AS (
    SELECT dots.q_id, dots.vec_id,
           ROUND((dot_fp / {float(FP12)})
                 / (sqrt(na.norm_fp / {float(FP12)}) * sqrt(nb.norm_fp / {float(FP12)})),
                 6) AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = dots.q_id
    JOIN norms nb ON nb.vec_id = dots.vec_id
),
ranked AS (
    SELECT q_id, vec_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank,
           cosine
    FROM scored
)
SELECT q_id, vec_id, rank, cosine FROM ranked WHERE rank <= {TOP_K}"""
