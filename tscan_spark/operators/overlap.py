"""Cross-sentence overlap operators (SURVEY.md §2.6).

L1 — sentence->sentence argument overlap (lag 1): the reference compares
each overlap-candidate word of a sentence against the *previous*
sentence's candidate buffer, resetting at paragraph boundaries; the
first sentence of a paragraph is NA
(``getSentenceOverlap`` /root/reference/src/wordstats.cxx:333-360,
buffers ``fill_word_lemma_buffers`` src/tscan.cxx:2092-2103).

L2 — document sliding-buffer overlap: each candidate word is tested
against the previous ``OVERLAP_SIZE`` words of the document
(``calculate_doc_overlap`` src/tscan.cxx:3039-3090; default buffer 50,
configurable — scaled to 20 for the synthetic corpus).

Both are pure Window + higher-order-function plans: no Python UDFs, no
extra shuffles beyond the window sort. The window partition key is
always (doc_id[, par_idx]), so long-document skew is bounded by document
length; candidate gating matches the reference (content words stand in
for the N/name/pronoun/head-verb candidate test, wordstats.cxx:313-331;
the reference's pronoun equivalence classes are modeled by the parallel
lemma-level match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import annotate, corpus

OVERLAP_SIZE = 20


def _annotated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return annotate.annotate(corpus.tokens_long(corpus.load(spark, sf_dir, "documents")))


def sentence_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: per-sentence overlap counts vs the previous sentence's buffer.

    Output grain: (doc_id, par_idx, sent_idx) with word- and lemma-level
    overlap counts (NULL for the first sentence of each paragraph).
    """
    tok = _annotated(spark, sf_dir)
    cand_word = F.when(F.col("is_content") == 1, F.col("l_word"))
    cand_lemma = F.when(F.col("is_content") == 1, F.col("lemma"))
    # candidate words/lemmas in document order: collect (idx, value)
    # structs (collect_list skips NULL non-candidates), sort, project —
    # deterministic regardless of shuffle order
    sent = tok.groupBy("doc_id", "par_idx", "sent_idx").agg(
        F.sort_array(F.collect_list(F.struct("word_idx", cand_word.alias("v")))).alias("_cw"),
        F.sort_array(F.collect_list(F.struct("word_idx", cand_lemma.alias("v")))).alias("_cl"),
        F.sort_array(F.collect_set(cand_word)).alias("cand_word_set"),
        F.sort_array(F.collect_set(cand_lemma)).alias("cand_lemma_set"),
    )
    sent = (
        sent.withColumn("cand_words", F.transform("_cw", lambda s: s["v"]))
        .withColumn("cand_lemmas", F.transform("_cl", lambda s: s["v"]))
        .drop("_cw", "_cl")
    )
    w = Window.partitionBy("doc_id", "par_idx").orderBy("sent_idx")
    sent = sent.withColumn("prev_word_set", F.lag("cand_word_set").over(w)).withColumn(
        "prev_lemma_set", F.lag("cand_lemma_set").over(w)
    )
    match_cnt = lambda cur, prev: F.when(
        F.col(prev).isNotNull(),
        F.size(F.filter(F.col(cur), lambda x: F.array_contains(F.col(prev), x))),
    ).cast("int")
    return sent.select(
        "doc_id",
        "par_idx",
        "sent_idx",
        match_cnt("cand_words", "prev_word_set").alias("word_overlap_cnt"),
        match_cnt("cand_lemmas", "prev_lemma_set").alias("lemma_overlap_cnt"),
    )


SQL_SENTENCE_OVERLAP_TMPL = """
SELECT s.doc_id, s.par_idx, s.sent_idx,
       CAST(CASE WHEN s.prev_word_set IS NOT NULL THEN
            len(list_filter(s.cand_words, w -> list_contains(s.prev_word_set, w)))
       END AS INT) AS word_overlap_cnt,
       CAST(CASE WHEN s.prev_lemma_set IS NOT NULL THEN
            len(list_filter(s.cand_lemmas, w -> list_contains(s.prev_lemma_set, w)))
       END AS INT) AS lemma_overlap_cnt
FROM (
    SELECT *,
           lag(cand_word_set) OVER (PARTITION BY doc_id, par_idx ORDER BY sent_idx)
               AS prev_word_set,
           lag(cand_lemma_set) OVER (PARTITION BY doc_id, par_idx ORDER BY sent_idx)
               AS prev_lemma_set
    FROM (
        SELECT doc_id, par_idx, sent_idx,
               coalesce(list(l_word ORDER BY word_idx) FILTER (WHERE is_content = 1),
                        []) AS cand_words,
               coalesce(list(lemma ORDER BY word_idx) FILTER (WHERE is_content = 1),
                        []) AS cand_lemmas,
               coalesce(list(DISTINCT l_word) FILTER (WHERE is_content = 1),
                        []) AS cand_word_set,
               coalesce(list(DISTINCT lemma) FILTER (WHERE is_content = 1),
                        []) AS cand_lemma_set
        FROM annot
        GROUP BY doc_id, par_idx, sent_idx
    )
) s"""


def doc_sliding_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: doc-grain sliding-buffer overlap counts.

    For every candidate token at position >= OVERLAP_SIZE, test whether
    the same l_word (resp. lemma) occurred in the previous OVERLAP_SIZE
    tokens (buffer holds ALL words; only the *test* is candidate-gated,
    matching src/tscan.cxx:3039-3090).
    """
    tok = _annotated(spark, sf_dir)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("word_idx")
        .rowsBetween(-OVERLAP_SIZE, -1)
    )
    tok = tok.withColumn("buf_w", F.collect_list("l_word").over(w)).withColumn(
        "buf_l", F.collect_list("lemma").over(w)
    )
    eligible = (F.col("is_content") == 1) & (F.col("word_idx") >= OVERLAP_SIZE)
    tok = tok.select(
        "doc_id",
        eligible.cast("int").alias("is_eligible"),
        (eligible & F.array_contains("buf_w", F.col("l_word"))).cast("int").alias("hit_w"),
        (eligible & F.array_contains("buf_l", F.col("lemma"))).cast("int").alias("hit_l"),
    )
    return tok.groupBy("doc_id").agg(
        F.sum("is_eligible").cast("long").alias("eligible_cnt"),
        F.sum("hit_w").cast("long").alias("word_overlap_cnt"),
        F.sum("hit_l").cast("long").alias("lemma_overlap_cnt"),
    )


SQL_DOC_SLIDING_OVERLAP_TMPL = """
SELECT doc_id,
       CAST(SUM(CASE WHEN is_content = 1 AND word_idx >= {n} THEN 1 ELSE 0 END) AS BIGINT)
           AS eligible_cnt,
       CAST(SUM(CASE WHEN is_content = 1 AND word_idx >= {n} AND EXISTS (
            SELECT 1 FROM annot b
            WHERE b.doc_id = a.doc_id
              AND b.word_idx BETWEEN a.word_idx - {n} AND a.word_idx - 1
              AND b.l_word = a.l_word
       ) THEN 1 ELSE 0 END) AS BIGINT) AS word_overlap_cnt,
       CAST(SUM(CASE WHEN is_content = 1 AND word_idx >= {n} AND EXISTS (
            SELECT 1 FROM annot b
            WHERE b.doc_id = a.doc_id
              AND b.word_idx BETWEEN a.word_idx - {n} AND a.word_idx - 1
              AND b.lemma = a.lemma
       ) THEN 1 ELSE 0 END) AS BIGINT) AS lemma_overlap_cnt
FROM annot a
GROUP BY doc_id"""
