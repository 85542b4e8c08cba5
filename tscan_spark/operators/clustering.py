"""Distributed k-means document clustering over the embedding column.

Lloyd's algorithm as the canonical iterative-refinement shape on Spark
(same family as ``training.quality_logreg``): the model state — K
centroids, K x 64 doubles — lives on the driver; every iteration is two
hash aggregates over the exploded embedding grain (assignment distances,
then new centroid means), and the only collect is model-sized.  The
per-iteration plan is rebuilt from centroid LITERALS, so lineage never
grows with the iteration count (the connected-components lesson: plan
growth, not data, is what kills iterative jobs).

Determinism/oracle contract: squared distances fold in FP12 fixed point
(exact int64, order-independent), centroid means fold token values in
1e9 fixed point then round to 9 dp — so the whole training trajectory
is bit-reproducible and the DuckDB oracle replays ALL iterations as
chained CTEs (init -> assign -> recenter -> ... -> final assignment).
Empty clusters need no special case: both engines drop a cluster that
lost its members from the next centroid table in exactly the same way
(the group-by simply has no row for it).

Scale: assignment joins the exploded embedding grain against a K*dim-row
broadcast literal and reduces by (vec_id, cluster) — one shuffle on
vec_id per iteration, no pairwise term anywhere; 10^9 vectors x K=1000
is a ~64k-row broadcast and the same two hash aggregates.  Production
initialises with k-means|| instead of first-K and stops on centroid
movement; the registered query pins first-K init and a fixed iteration
count because the oracle must replay the exact trajectory.

Reference analog: the reference buckets documents into difficulty bands
by fixed thresholds (LiNT levels, structstats.cxx:1004-1041); here the
bands are learned from the corpus geometry instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import corpus
from tscan_spark.cache import with_cache as _with_cache
from tscan_spark.operators.similarity import FP12

EMB_DIM = 64
KMEANS_K = 4
KMEANS_ITERS = 2  # centroid updates; assignments run ITERS+1 times
FP9 = 1_000_000_000


def _emb_long(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).withColumn("x", F.col("x").cast("double"))


def _assign(long: DataFrame, cent: DataFrame) -> DataFrame:
    """Cluster assignment: argmin of FP12 fixed-point squared distance.

    One broadcast join (K*dim literal rows) + one (vec_id, cluster)
    hash aggregate + one vec_id-bounded window.
    """
    diff = F.col("x") - F.col("cx")
    dist = (
        long.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "cluster")
        .agg(F.sum(F.round(diff * diff * FP12, 0).cast("long")).alias("dist_fp"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist_fp", "cluster")
    return dist.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMEANS_ITERS Lloyd steps from first-K init; final assignment.

    Columns: vec_id, cluster, dist_fp (exact FP12 squared distance).
    """
    emb = corpus.load(spark, sf_dir, "embeddings")
    long = _emb_long(emb).persist()

    # init: embeddings of the K smallest vec_ids (K rows collected)
    init = (
        emb.orderBy("vec_id")
        .limit(KMEANS_K)
        .select("vec_id", "embedding")
        .collect()
    )
    state = [
        (c, d, float(row["embedding"][d]))
        for c, row in enumerate(init)
        for d in range(EMB_DIM)
    ]
    for _ in range(KMEANS_ITERS):
        cent = spark.createDataFrame(state, "cluster int, dim int, cx double")
        assigned = _assign(long, cent)
        new = (
            assigned.join(long, "vec_id")
            .groupBy("cluster", "dim")
            .agg(
                F.round(
                    F.sum(F.round(F.col("x") * FP9, 0).cast("long"))
                    / F.lit(float(FP9))
                    / F.count(F.lit(1)),
                    9,
                ).alias("cx")
            )
        )
        # model-sized collect (<= K*dim rows); lineage restarts here
        state = [(r["cluster"], r["dim"], float(r["cx"])) for r in new.collect()]

    cent = spark.createDataFrame(state, "cluster int, dim int, cx double")
    out = (
        _assign(long, cent)
        .select(
            "vec_id",
            F.col("cluster").cast("int").alias("cluster"),
            # double: DuckDB's SUM over BIGINT widens to HUGEINT ->
            # pandas float64 (driver typed-hash parity, r5 hash-red)
            F.col("dist_fp").cast("double").alias("dist_fp"),
        )
        .orderBy("vec_id")
    )
    return _with_cache(out, long)


def sql_kmeans_clusters() -> str:
    """Replay the full Lloyd trajectory as chained CTEs (1-based dims)."""
    x = "CAST(e.embedding[c.i] AS DOUBLE)"
    dist = f"SUM(CAST(ROUND(({x} - c.cx) * ({x} - c.cx) * {FP12}, 0) AS BIGINT))"
    parts = [
        f"""init AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, vec_id
    FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K})
),
c0 AS (
    SELECT init.cluster, r.i, CAST(e.embedding[r.i] AS DOUBLE) AS cx
    FROM init JOIN embeddings e USING (vec_id)
    CROSS JOIN range(1, {EMB_DIM + 1}) r(i)
)"""
    ]
    prev = "c0"
    for k in range(1, KMEANS_ITERS + 1):
        parts.append(
            f"""d{k} AS (
    SELECT e.vec_id, c.cluster, {dist} AS dist_fp
    FROM embeddings e CROSS JOIN {prev} c
    GROUP BY e.vec_id, c.cluster
),
a{k} AS (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist_fp, cluster) AS rn
    FROM d{k}
),
c{k} AS (
    SELECT a.cluster, r.i,
           ROUND(SUM(CAST(ROUND(CAST(e.embedding[r.i] AS DOUBLE) * {FP9}, 0)
                          AS BIGINT)) / {FP9}.0 / COUNT(*), 9) AS cx
    FROM a{k} a JOIN embeddings e USING (vec_id)
    CROSS JOIN range(1, {EMB_DIM + 1}) r(i)
    WHERE a.rn = 1
    GROUP BY a.cluster, r.i
)"""
        )
        prev = f"c{k}"
    parts.append(
        f"""df AS (
    SELECT e.vec_id, c.cluster, {dist} AS dist_fp
    FROM embeddings e CROSS JOIN {prev} c
    GROUP BY e.vec_id, c.cluster
),
af AS (
    SELECT vec_id, cluster, dist_fp,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist_fp, cluster) AS rn
    FROM df
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT vec_id, CAST(cluster AS INT) AS cluster, dist_fp
FROM af WHERE rn = 1
ORDER BY vec_id"""
    )


SQL_KMEANS_CLUSTERS = sql_kmeans_clusters()
