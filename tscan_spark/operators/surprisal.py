"""Surprisal / language-model aggregates (SURVEY.md §2.5 A10).

The reference receives per-word log-probabilities from the Wopr LM
service (``orderWopr``, /root/reference/src/tscan.cxx:1978-2064) and
computes sentence-level averages plus entropy/perplexity normalized by
sentence length, then paragraph/document values as **sums of sentence
values divided by the sentence count** (avg-of-avgs,
src/structstats.cxx:984-1000).

The engine consumes surprisal as an input column; the testdata ships
none, so it is synthesized deterministically from the corpus-derived
frequency lexicon (logprob10 = -freq_log/3.7 - (word_idx % 7)/19 —
position-dependent so sentence values genuinely differ), and the
aggregate ladder implements the reference's exact normalization shapes
with fixed-point cross-engine-exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import corpus, lexicons
from tscan_spark.functions.scalars import sql_freq_log


def token_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token grain with the synthetic logprob10 column."""
    documents = corpus.load(spark, sf_dir, "documents")
    tok = corpus.tokens_long(documents)
    wf = lexicons.word_freq(documents)
    t = tok.join(F.broadcast(wf), "word")
    # divisors chosen to avoid exact decimal ties at the 6th place
    # (x/4 of a 6dp value ends in ...25/...5/...75 -> round-tie cross-engine
    # disagreement); 3.7/19 produce generic doubles
    lp = -F.round(F.col("wf_freq_log"), 6) / 3.7 - (F.col("word_idx") % 7) / 19.0
    return t.withColumn("logprob10", F.round(lp, 6))


def surprisal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence avg/entropy/perplexity norms -> doc avg-of-avgs (A10)."""
    t = token_surprisal(spark, sf_dir)
    sent = t.groupBy("doc_id", "sent_idx").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("logprob10") * 1e6, 0).cast("long")).alias("lp_fp"),
    )
    # no rounding: lp_fp and n are exact integers, so both engines
    # compute bit-identical doubles (rounding would reintroduce
    # decimal-tie divergence)
    sent = sent.withColumn(
        "avg_lp10", F.col("lp_fp") / 1e6 / F.col("n")
    ).withColumn(
        # the reference's /len^2 normalization variant (entropy /
        # perplexity norms, src/tscan.cxx:2855-2864)
        "lp_norm_len2",
        F.col("lp_fp") / 1e6 / (F.col("n") * F.col("n")),
    )
    doc = sent.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("sent_cnt"),
        (
            F.sum(F.round(F.col("avg_lp10") * 1e6, 0).cast("long"))
            / 1e6
            / F.count(F.lit(1))
        ).alias("avg_lp10"),
        (
            F.sum(F.round(F.col("lp_norm_len2") * 1e6, 0).cast("long"))
            / 1e6
            / F.count(F.lit(1))
        ).alias("lp_norm_len2"),
    )
    return doc.withColumn("sent_cnt", F.col("sent_cnt").cast("long"))


def surprisal_paragraph_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 at PARAGRAPH grain: the reference's paragraph CSV carries the
    same Wopr cells as the document vector — sentence-value sums divided
    by the paragraph's sentence count (avg-of-avgs within the paragraph,
    structstats.cxx:984-1000 via parstats). Same fixed-point ladder as
    :func:`surprisal_features`, keyed by (doc_id, par_idx)."""
    t = token_surprisal(spark, sf_dir)
    sent = t.groupBy("doc_id", "par_idx", "sent_idx").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("logprob10") * 1e6, 0).cast("long")).alias("lp_fp"),
    )
    sent = sent.withColumn(
        "avg_lp10", F.col("lp_fp") / 1e6 / F.col("n")
    ).withColumn(
        "lp_norm_len2",
        F.col("lp_fp") / 1e6 / (F.col("n") * F.col("n")),
    )
    par = sent.groupBy("doc_id", "par_idx").agg(
        F.count(F.lit(1)).cast("long").alias("sent_cnt"),
        (
            F.sum(F.round(F.col("avg_lp10") * 1e6, 0).cast("long"))
            / 1e6
            / F.count(F.lit(1))
        ).alias("avg_lp10"),
        (
            F.sum(F.round(F.col("lp_norm_len2") * 1e6, 0).cast("long"))
            / 1e6
            / F.count(F.lit(1))
        ).alias("lp_norm_len2"),
    )
    return par


def sql_surprisal_paragraph_features() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + f""",
wf AS (
    SELECT word,
           {sql_freq_log("COUNT(*)", "(SELECT COUNT(*) FROM tok)")} AS wf_freq_log
    FROM tok GROUP BY word
),
t AS (
    SELECT tok.*,
           ROUND(-ROUND(wf_freq_log, 6) / 3.7 - (word_idx % 7) / 19.0, 6)
               AS logprob10
    FROM tok JOIN wf USING (word)
),
sentg AS (
    SELECT doc_id, par_idx, sent_idx, COUNT(*) AS n,
           SUM(CAST(ROUND(logprob10 * 1e6, 0) AS BIGINT)) AS lp_fp
    FROM t GROUP BY doc_id, par_idx, sent_idx
),
sentv AS (
    SELECT doc_id, par_idx,
           lp_fp / 1e6 / n AS avg_lp10,
           lp_fp / 1e6 / (n * n) AS lp_norm_len2
    FROM sentg
)
SELECT doc_id, par_idx,
       CAST(COUNT(*) AS BIGINT) AS sent_cnt,
       SUM(CAST(ROUND(avg_lp10 * 1e6, 0) AS BIGINT)) / 1e6 / COUNT(*) AS avg_lp10,
       SUM(CAST(ROUND(lp_norm_len2 * 1e6, 0) AS BIGINT)) / 1e6 / COUNT(*)
           AS lp_norm_len2
FROM sentv
GROUP BY doc_id, par_idx"""
    )


def sql_surprisal_features() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + f""",
wf AS (
    SELECT word,
           {sql_freq_log("COUNT(*)", "(SELECT COUNT(*) FROM tok)")} AS wf_freq_log
    FROM tok GROUP BY word
),
t AS (
    SELECT tok.*,
           ROUND(-ROUND(wf_freq_log, 6) / 3.7 - (word_idx % 7) / 19.0, 6)
               AS logprob10
    FROM tok JOIN wf USING (word)
),
sentg AS (
    SELECT doc_id, sent_idx, COUNT(*) AS n,
           SUM(CAST(ROUND(logprob10 * 1e6, 0) AS BIGINT)) AS lp_fp
    FROM t GROUP BY doc_id, sent_idx
),
sentv AS (
    SELECT doc_id,
           lp_fp / 1e6 / n AS avg_lp10,
           lp_fp / 1e6 / (n * n) AS lp_norm_len2
    FROM sentg
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS sent_cnt,
       SUM(CAST(ROUND(avg_lp10 * 1e6, 0) AS BIGINT)) / 1e6 / COUNT(*) AS avg_lp10,
       SUM(CAST(ROUND(lp_norm_len2 * 1e6, 0) AS BIGINT)) / 1e6 / COUNT(*)
           AS lp_norm_len2
FROM sentv
GROUP BY doc_id"""
    )
