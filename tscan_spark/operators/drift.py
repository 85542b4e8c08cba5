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
            F.first("tot_s").alias("n_tokens"),
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
            F.sum("new_types").over(w).alias("cum_types"),
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
