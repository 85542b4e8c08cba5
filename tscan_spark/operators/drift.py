"""Corpus-drift monitoring operators for training-data pipelines:
per-source token-distribution drift and vocabulary-growth curves.

A 100 TB ingest pipeline re-trains on corpus snapshots that shift over
time; the standard guards are (a) a distribution-drift score per source
against the corpus-wide token distribution (KL divergence over the
unigram model — the same unigram statistics the reference's frequency
ladder consumes, tscan.cxx:462-471) and (b) a vocabulary-growth
(Heaps-law) curve that shows whether a source still contributes new
types or has saturated.

Physical plans (both corpus-linear, one token-grain pass each):

- ``token_drift_kl``: one (source, word) hash aggregate over the token
  grain; the corpus-wide distribution is derived FROM that aggregate
  (a second, vocabulary-sized aggregate — never a second corpus pass),
  joined back on the word key.  The join is vocabulary x sources sized;
  at web scale both sides are already reduced, and AQE picks a
  broadcast for the corpus-marginal side (|vocab| rows).  The KL sum
  uses the engine's fixed-point convention (x1e9 BIGINT) so the fold is
  order-independent and replayable by the DuckDB oracle bit-for-bit.
- ``vocab_growth``: first-occurrence bucketing.  Each word's earliest
  arrival bucket per source is ``min(doc_id // BUCKET_DOCS)`` — a pure
  projection plus one vocabulary-keyed aggregate; the cumulative curve
  is a window over (source, bucket), i.e. O(sources x buckets) rows.
  No global sort, no per-doc window.  At production scale arrival
  order comes from the snapshot's commit sequence (sources/snapshots
  manifest order) instead of the synthetic doc_id arithmetic; the plan
  shape is identical.  The scale path for *total* distinct counts is
  ``approx_count_distinct`` (HLL); the registered query keeps exact
  counts because the oracle must replay them exactly — the swap is one
  expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import corpus
from tscan_spark.cache import with_cache as _with_cache

BUCKET_DOCS = 100  # vocab_growth arrival-bucket width (docs per bucket)


# ---------------------------------------------------------------------------
# token-distribution drift (KL vs corpus marginal)
# ---------------------------------------------------------------------------


def token_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence against the corpus distribution.

    KL(source || corpus) = sum_w p_s(w) * ln(p_s(w) / p_c(w)); every
    word in a source is in the corpus by construction, so no smoothing
    is needed.  Each term is rounded to 9 dp and folded in fixed point
    (x1e9 BIGINT) — order-independent, oracle-replayable.

    Columns: source, n_tokens, n_types, coverage (share of corpus
    vocabulary the source uses, 6 dp), kl_nats (6 dp).
    """
    tok = corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))
    # persist: the (source, word) aggregate feeds 3 consumers (corpus
    # marginal, source totals, the KL join) — cache contract applies
    # (tscan_spark.cache); it is vocabulary x sources sized, never
    # corpus sized, so the memory bound holds at any corpus scale.
    sw = tok.groupBy("source", "word").agg(F.count("*").alias("cnt")).persist()
    corpus_w = sw.groupBy("word").agg(F.sum("cnt").alias("cnt_c"))
    tot_c = corpus_w.agg(
        F.sum("cnt_c").alias("tot_c"), F.count("*").alias("types_c")
    )
    src_tot = sw.groupBy("source").agg(F.sum("cnt").alias("tot_s"))

    j = (
        sw.join(F.broadcast(corpus_w), "word")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(tot_c))
    )
    p_s = F.col("cnt") / F.col("tot_s")
    p_c = F.col("cnt_c") / F.col("tot_c")
    term = F.round(p_s * F.log(p_s / p_c), 9)
    out = (
        j.groupBy("source")
        .agg(
            # double: the DuckDB oracle's MIN over a SUM widens to
            # HUGEINT -> pandas float64; the driver hashes typed values,
            # so the Spark side must emit the same dtype (r5 hash-red)
            F.first("tot_s").cast("double").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.round(F.count("*") / F.first("types_c"), 6).alias("coverage"),
            F.round(
                F.sum(F.round(term * 1e9, 0).cast("long")) / 1e9, 6
            ).alias("kl_nats"),
        )
        .orderBy("source")
    )
    return _with_cache(out, sw)


SQL_TOKEN_DRIFT_KL = (
    "WITH "
    + corpus.SQL_TOK_CTE.strip()
    + """,
sw AS (
    SELECT source, word, COUNT(*) AS cnt FROM tok GROUP BY source, word
),
cw AS (
    SELECT word, SUM(cnt) AS cnt_c FROM sw GROUP BY word
),
totc AS (
    SELECT SUM(cnt_c) AS tot_c, COUNT(*) AS types_c FROM cw
),
st AS (
    SELECT source, SUM(cnt) AS tot_s FROM sw GROUP BY source
)
SELECT sw.source,
       MIN(st.tot_s) AS n_tokens,
       COUNT(*) AS n_types,
       ROUND(COUNT(*) * 1.0 / MIN(totc.types_c), 6) AS coverage,
       ROUND(SUM(CAST(ROUND(ROUND(
           (sw.cnt * 1.0 / st.tot_s)
           * LN((sw.cnt * 1.0 / st.tot_s) / (cw.cnt_c * 1.0 / totc.tot_c)),
           9) * 1e9, 0) AS BIGINT)) / 1e9, 6) AS kl_nats
FROM sw
JOIN cw USING (word)
JOIN st USING (source)
CROSS JOIN totc
GROUP BY sw.source
ORDER BY sw.source"""
)


# ---------------------------------------------------------------------------
# vocabulary growth (Heaps-law curve)
# ---------------------------------------------------------------------------


def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative new-type counts per (source, arrival bucket).

    bucket = doc_id // BUCKET_DOCS (synthetic arrival order); a word
    counts as NEW in the earliest bucket where its source first sees
    it.  Output: source, bucket, new_types, cum_types, tokens_in_bucket.
    The cumulative window runs over O(sources x buckets) rows only.
    """
    tok = corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))
    tok = tok.withColumn(
        "bucket", (F.col("doc_id") / F.lit(BUCKET_DOCS)).cast("long")
    )
    firsts = tok.groupBy("source", "word").agg(F.min("bucket").alias("bucket"))
    new_types = firsts.groupBy("source", "bucket").agg(
        F.count("*").alias("new_types")
    )
    bucket_tok = tok.groupBy("source", "bucket").agg(
        F.count("*").alias("tokens_in_bucket")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        new_types.join(bucket_tok, ["source", "bucket"])
        .select(
            "source",
            "bucket",
            "new_types",
            # double: DuckDB's window SUM over BIGINT widens to
            # HUGEINT -> pandas float64 (driver typed-hash parity)
            F.sum("new_types").over(w).cast("double").alias("cum_types"),
            "tokens_in_bucket",
        )
        .orderBy("source", "bucket")
    )


SQL_VOCAB_GROWTH = (
    "WITH "
    + corpus.SQL_TOK_CTE.strip()
    + f""",
tokb AS (
    SELECT source, word, doc_id // {BUCKET_DOCS} AS bucket FROM tok
),
firsts AS (
    SELECT source, word, MIN(bucket) AS bucket FROM tokb GROUP BY source, word
),
nt AS (
    SELECT source, bucket, COUNT(*) AS new_types FROM firsts GROUP BY source, bucket
),
bt AS (
    SELECT source, bucket, COUNT(*) AS tokens_in_bucket FROM tokb GROUP BY source, bucket
)
SELECT nt.source, nt.bucket, nt.new_types,
       SUM(nt.new_types) OVER (
           PARTITION BY nt.source ORDER BY nt.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_types,
       bt.tokens_in_bucket
FROM nt JOIN bt USING (source, bucket)
ORDER BY nt.source, nt.bucket"""
)


# ---------------------------------------------------------------------------
# embedding-space drift: per-source centroids + cohesion
# ---------------------------------------------------------------------------


def source_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source embedding centroid norm + cosine cohesion.

    The embedding-space counterpart of ``token_drift_kl``: a source
    whose vectors drift (new topics, encoder change, ingest bug) shows
    a falling mean cosine-to-centroid before any token statistic
    moves.  Centroid arithmetic runs on the similarity family's FP6
    integer quantizer (per-dim FLOOR-mean — reduction-order-free, so
    the DuckDB oracle replays it exactly); per-vector cosines use the
    exact FP6 integer dot (64 dims x 1e12/term fits int64).

    Plan: one embeddings scan exploded to (vec, dim), a doc_id join
    for the source key, one (source, dim) centroid aggregate
    (sources x 64 rows — broadcast back), one per-vector dot + one
    source-grain cohesion aggregate.  Corpus touched once.
    """
    from tscan_spark.operators.similarity import FP6, _emb_long

    docs = corpus.load(spark, sf_dir, "documents").select("doc_id", "source")
    emb = corpus.load(spark, sf_dir, "embeddings")
    el = _emb_long(emb).select(
        "vec_id", "dim", F.round(F.col("x") * FP6, 0).cast("long").alias("xfp6")
    )
    long = el.join(docs, el["vec_id"] == docs["doc_id"]).select(
        "vec_id", "source", "dim", "xfp6"
    )
    cent = long.groupBy("source", "dim").agg(
        F.floor(F.sum("xfp6") / F.count(F.lit(1))).cast("long").alias("cfp6")
    )
    joined = long.join(F.broadcast(cent), ["source", "dim"])
    per_vec = joined.groupBy("source", "vec_id").agg(
        F.sum(F.col("xfp6") * F.col("cfp6")).alias("dot_fp"),
        F.sum(F.col("xfp6") * F.col("xfp6")).alias("nx_fp"),
        F.sum(F.col("cfp6") * F.col("cfp6")).alias("nc_fp"),
    )
    cos = F.col("dot_fp") / (
        F.sqrt(F.col("nx_fp").cast("double")) * F.sqrt(F.col("nc_fp").cast("double"))
    )
    return (
        per_vec.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_vecs"),
            F.round(
                F.sqrt(F.any_value("nc_fp").cast("double")) / F.lit(float(FP6)), 6
            ).alias("centroid_norm"),
            F.round(F.avg(cos), 6).alias("mean_cos"),
            F.round(F.min(cos), 6).alias("min_cos"),
        )
        .orderBy("source")
    )


def sql_source_embedding_drift() -> str:
    from tscan_spark.operators.similarity import FP6

    return f"""
WITH long AS (
    SELECT e.vec_id, d.source, r.i AS dim,
           CAST(ROUND(CAST(e.embedding[r.i] AS DOUBLE) * {FP6}, 0) AS BIGINT)
               AS xfp6
    FROM embeddings e
    JOIN documents d ON d.doc_id = e.vec_id
    CROSS JOIN range(1, 65) r(i)
),
cent AS (
    SELECT source, dim,
           CAST(FLOOR(SUM(xfp6) * 1.0 / COUNT(*)) AS BIGINT) AS cfp6
    FROM long GROUP BY 1, 2
),
per_vec AS (
    SELECT l.source, l.vec_id,
           SUM(l.xfp6 * c.cfp6) AS dot_fp,
           SUM(l.xfp6 * l.xfp6) AS nx_fp,
           SUM(c.cfp6 * c.cfp6) AS nc_fp
    FROM long l JOIN cent c USING (source, dim)
    GROUP BY 1, 2
),
cos AS (
    SELECT source, vec_id, nc_fp,
           dot_fp / (sqrt(CAST(nx_fp AS DOUBLE)) * sqrt(CAST(nc_fp AS DOUBLE)))
               AS cosv
    FROM per_vec
)
SELECT source,
       CAST(COUNT(*) AS INT) AS n_vecs,
       ROUND(sqrt(CAST(ANY_VALUE(nc_fp) AS DOUBLE)) / {float(FP6)}, 6)
           AS centroid_norm,
       ROUND(AVG(cosv), 6) AS mean_cos,
       ROUND(MIN(cosv), 6) AS min_cos
FROM cos
GROUP BY source
ORDER BY source"""
