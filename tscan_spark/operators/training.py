"""Training-set construction operators: deterministic epoch shuffle /
sharding, and a distributed batch-gradient-descent quality classifier.

Between curation (dedup/quality/mix) and the trainer sit two more
steps a 100 TB pipeline needs:

- ``training_order_shuffle``: a *deterministic* global permutation of
  the corpus into S shards with a stable position inside each shard —
  the reproducible data-order contract training runs depend on.  The
  permutation key is the replayable content hash of (doc_id, seed), so
  re-running the job (or re-running one shard) yields the identical
  order with zero coordination.  Physical plan: one projection computes
  (key, shard); the per-shard position is a window partitioned BY SHARD
  — shards bound partition size (corpus/S rows), so the sort is
  size-capped by construction; production uses
  ``repartitionByRange(shard, key)`` + ``sortWithinPartitions`` and
  writes each shard as one file, same topology.
- ``quality_logreg``: logistic regression trained by K full-batch
  gradient-descent iterations entirely as DataFrame aggregates — the
  canonical "iterative algorithm on Spark" shape (model state on the
  driver, O(model) bytes; data never leaves the cluster).  Each
  iteration is ONE hash aggregate producing the 4-component gradient;
  the collect is model-sized (4 doubles), never corpus-sized.  The
  gradient fold uses the engine's fixed-point convention (terms rounded
  to 9 dp, summed as x1e9 BIGINT) so iteration trajectories are
  order-independent and the DuckDB oracle replays the full training
  loop bit-for-bit via chained CTEs.  Labels are a fixed synthetic rule
  (documented below) — the production variant takes a labeled frame.

Reference analog: the reference scores documents against externally
trained difficulty/frequency models (tscan.cxx fillWF/fillN lexicon
consumers); here the model itself is also trained in-engine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import corpus
from tscan_spark.cache import with_cache as _with_cache

# ---------------------------------------------------------------------------
# deterministic epoch shuffle / sharding
# ---------------------------------------------------------------------------

SHUFFLE_SEED = 7
N_SHARDS = 8


def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus permutation into N_SHARDS training shards.

    key   = content_hash(doc_id || ':' || seed)  (pure projection)
    shard = key % N_SHARDS
    pos   = row_number within shard, ordered by (key, doc_id)

    Columns: doc_id, source, shard, pos.
    """
    docs = corpus.load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        corpus.content_hash_expr(
            F.concat(F.col("doc_id").cast("string"), F.lit(f":{SHUFFLE_SEED}"))
        ).alias("skey"),
    ).withColumn("shard", (F.col("skey") % N_SHARDS).cast("int"))
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return keyed.select(
        "doc_id",
        "source",
        "shard",
        F.row_number().over(w).alias("pos"),
    ).orderBy("shard", "pos")


SQL_TRAINING_ORDER_SHUFFLE = f"""
WITH keyed AS (
    SELECT doc_id, source,
           {corpus.sql_content_hash(f"(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SEED}')")} AS skey
    FROM documents
)
SELECT doc_id, source,
       CAST(skey % {N_SHARDS} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY skey % {N_SHARDS} ORDER BY skey, doc_id) AS INT) AS pos
FROM keyed
ORDER BY shard, pos"""


# ---------------------------------------------------------------------------
# logistic-regression quality classifier (full-batch GD, K iterations)
# ---------------------------------------------------------------------------
#
# Features per document (doc-grain aggregate over the token grain):
#   x0 = 1 (bias)
#   x1 = n_tok / 100
#   x2 = type-token ratio
#   x3 = mean word length - 4.5  (centered; corpus mean ~4.5)
# Synthetic label (the documented fixed-rule convention, cf. HOLDOUT_MOD
# in curation.py):  y = 1 iff n_tok >= 56 AND ttr >= 0.45 (both are the
# corpus medians, so classes are roughly balanced).
#
# GD: w := w - LR * g,  g_j = round( sum_i round((sigmoid(w.x_i)-y_i)*x_ij, 9)
#                                    folded x1e9 BIGINT ) / 1e9 / n, 9)
# LR = 1.0 so the weight update is a plain double subtraction of two
# 9 dp-rounded values — bitwise identical on both engines.

LOGREG_ITERS = 3
LOGREG_LR = 1.0
_FEATS = ("x0", "x1", "x2", "x3")


def _feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))
    f = tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.countDistinct("word").alias("n_types"),
        F.round(F.avg(F.length("word")), 9).alias("awl"),
    )
    ttr = F.round(F.col("n_types") / F.col("n_tok"), 9)
    return f.select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        F.round(F.col("n_tok") / 100.0, 9).alias("x1"),
        ttr.alias("x2"),
        F.round(F.col("awl") - 4.5, 9).alias("x3"),
        F.when((F.col("n_tok") >= 56) & (ttr >= 0.45), 1.0)
        .otherwise(0.0)
        .alias("y"),
    )


def _sigmoid(z):
    return 1.0 / (1.0 + F.exp(-z))


def quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train LOGREG_ITERS full-batch GD steps, score every document.

    Columns: doc_id, y, score (6 dp), pred.
    """
    feats = _feats(spark, sf_dir).persist()
    n = feats.count()  # one job; reused as a plain Python constant
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(LOGREG_ITERS):
        z = sum(F.lit(w[j]) * F.col(c) for j, c in enumerate(_FEATS))
        resid = _sigmoid(z) - F.col("y")
        aggs = [
            (
                F.sum(
                    F.round(F.round(resid * F.col(c), 9) * 1e9, 0).cast("long")
                )
                / 1e9
            ).alias(c)
            for c in _FEATS
        ]
        g = feats.agg(*aggs).collect()[0]
        # round(sum/n, 9) in Python: emulate SQL ROUND (half away from
        # zero) exactly — values this deep into the mantissa never sit
        # on the boundary, but floor(x*1e9+0.5) matches both engines.
        w = [
            w[j] - LOGREG_LR * (math.floor(abs(g[c]) / n * 1e9 + 0.5) / 1e9) * (1 if g[c] >= 0 else -1)
            for j, c in enumerate(_FEATS)
        ]
    z = sum(F.lit(w[j]) * F.col(c) for j, c in enumerate(_FEATS))
    score = F.round(_sigmoid(z), 6)
    out = feats.select(
        "doc_id",
        F.col("y").cast("int").alias("y"),
        score.alias("score"),
        (score >= 0.5).cast("int").alias("pred"),
    ).orderBy("doc_id")
    return _with_cache(out, feats)


def sql_quality_logreg() -> str:
    """Replay the full GD trajectory as chained 1-row CTEs."""
    feats = (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + """,
f0 AS (
    SELECT doc_id, COUNT(*) AS n_tok, COUNT(DISTINCT word) AS n_types,
           ROUND(AVG(LENGTH(word)), 9) AS awl
    FROM tok GROUP BY doc_id
),
feats AS (
    SELECT doc_id,
           1.0 AS x0,
           ROUND(n_tok / 100.0, 9) AS x1,
           ROUND(n_types * 1.0 / n_tok, 9) AS x2,
           ROUND(awl - 4.5, 9) AS x3,
           CASE WHEN n_tok >= 56 AND ROUND(n_types * 1.0 / n_tok, 9) >= 0.45
                THEN 1.0 ELSE 0.0 END AS y
    FROM f0
),
nn AS (SELECT COUNT(*) AS n FROM feats)"""
    )
    parts = [feats]
    prev_w = None  # None = all-zero weights
    for k in range(1, LOGREG_ITERS + 1):
        if prev_w is None:
            z = "0"
            src = "feats CROSS JOIN nn"
        else:
            z = " + ".join(f"{prev_w}.w{j} * {c}" for j, c in enumerate(_FEATS))
            src = f"feats CROSS JOIN nn CROSS JOIN {prev_w}"
        terms = ",\n           ".join(
            "ROUND(SUM(CAST(ROUND(ROUND((1.0/(1.0+EXP(-({z}))) - y) * {c}, 9)"
            " * 1e9, 0) AS BIGINT)) / 1e9 / MIN(nn.n), 9) AS g{j}".format(
                z=z, c=c, j=j
            )
            for j, c in enumerate(_FEATS)
        )
        parts.append(f"g{k} AS (\n    SELECT {terms}\n    FROM {src}\n)")
        upd = ", ".join(
            (
                f"0 - {LOGREG_LR} * g{k}.g{j} AS w{j}"
                if prev_w is None
                else f"{prev_w}.w{j} - {LOGREG_LR} * g{k}.g{j} AS w{j}"
            )
            for j in range(len(_FEATS))
        )
        w_src = f"g{k}" if prev_w is None else f"g{k} CROSS JOIN {prev_w}"
        parts.append(f"w{k} AS (\n    SELECT {upd}\n    FROM {w_src}\n)")
        prev_w = f"w{k}"
    zf = " + ".join(f"{prev_w}.w{j} * {c}" for j, c in enumerate(_FEATS))
    parts.append(
        f"""scored AS (
    SELECT doc_id, CAST(y AS INT) AS y,
           ROUND(1.0/(1.0+EXP(-({zf}))), 6) AS score
    FROM feats CROSS JOIN {prev_w}
)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT doc_id, y, score,
       CAST(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS INT) AS pred
FROM scored
ORDER BY doc_id"""
    )


# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------

SPLIT_SEED = 17
VAL_PCT = 5
TEST_PCT = 5


def eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-keyed train/val/test assignment + accounting.

    Every training pipeline needs a split that is (a) reproducible
    across runs and engines, (b) stable under corpus growth (a doc's
    split never changes when other docs arrive), and (c) computable as
    a pure projection — no sampling state, no global ordering.  The
    split key is the replayable content hash of (doc_id ':' seed)
    mod 100: buckets [0, TEST_PCT) -> test, [TEST_PCT,
    TEST_PCT+VAL_PCT) -> val, rest -> train.

    Plan: one narrow projection for the assignment, one doc-grain
    token count, one (source, split) aggregate.  Output: per (source,
    split) doc and token counts plus the realized fraction.
    """
    docs = corpus.load(spark, sf_dir, "documents")
    tok = corpus.tokens_long(docs).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok")
    )
    bucket = (
        corpus.content_hash_expr(
            F.concat(F.col("doc_id").cast("string"), F.lit(f":{SPLIT_SEED}"))
        )
        % 100
    )
    split = (
        F.when(bucket < TEST_PCT, F.lit("test"))
        .when(bucket < TEST_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    assigned = docs.select("doc_id", "source", split.alias("split")).join(
        tok, "doc_id"
    )
    per_source = assigned.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_source")
    )
    return (
        assigned.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .join(F.broadcast(per_source), "source")
        .select(
            "source",
            "split",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_docs") / F.col("n_source"), 6).alias("frac"),
        )
        .orderBy("source", "split")
    )


def sql_eval_split() -> str:
    skey = corpus.sql_content_hash(f"(CAST(doc_id AS VARCHAR) || ':{SPLIT_SEED}')")
    return f"""
WITH {corpus.SQL_TOK_CTE},
tl AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY 1),
assigned AS (
    SELECT d.doc_id, d.source, tl.n_tok,
           CASE WHEN {skey.replace("doc_id", "d.doc_id")} % 100 < {TEST_PCT}
                THEN 'test'
                WHEN {skey.replace("doc_id", "d.doc_id")} % 100
                     < {TEST_PCT + VAL_PCT} THEN 'val'
                ELSE 'train' END AS split
    FROM documents d JOIN tl ON d.doc_id = tl.doc_id
),
per_source AS (SELECT source, COUNT(*) AS n_source FROM assigned GROUP BY 1)
SELECT a.source, a.split,
       CAST(COUNT(*) AS INT) AS n_docs,
       CAST(SUM(a.n_tok) AS BIGINT) AS n_tokens,
       ROUND(COUNT(*) * 1.0 / ANY_VALUE(p.n_source), 6) AS frac
FROM assigned a JOIN per_source p USING (source)
GROUP BY a.source, a.split
ORDER BY a.source, a.split"""
