"""Cross-sentence overlap operators (SURVEY.md §2.6).

L1 — sentence->sentence argument overlap (lag 1): the reference compares
each overlap-candidate word of a sentence against the *previous*
sentence's candidate buffer, resetting at paragraph boundaries; the
first sentence of a paragraph is NA
(``getSentenceOverlap`` /root/reference/src/wordstats.cxx:333-360,
buffers ``fill_word_lemma_buffers`` src/tscan.cxx:2092-2103).

L2 — document sliding-buffer overlap: each candidate word is tested
against the previous ``overlap_size`` words of the document
(``calculate_doc_overlap`` src/tscan.cxx:3039-3090). The buffer size is
a parameter exactly like the reference's ``overlapSize`` setting
(default 50, src/tscan.cxx:935); ``OVERLAP_SIZE`` is the module default.

Both are pure Window + higher-order-function plans: no Python UDFs, no
extra shuffles beyond the window sort. The window partition key is
always (doc_id[, par_idx]), so long-document skew is bounded by document
length; candidate gating matches the reference (content OR pronoun,
the N/name/pronoun/head-verb candidate test, wordstats.cxx:313-331).

Pronoun equivalence (utils.cxx:24-90): matching is by *key-array
intersection* — each word's keys are [word, *pronoun-class markers]
(annotate.PRONOUN_CLASSES), so string equality and same-class pronoun
pairs both count, including overlapping class membership, exactly like
the reference's 7 static sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import annotate, corpus

# reference default overlapSize = 50 (src/tscan.cxx:935)
OVERLAP_SIZE = 50


def _annotated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return annotate.annotate(corpus.tokens_long(corpus.load(spark, sf_dir, "documents")))


def sentence_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: per-sentence overlap counts vs the previous sentence's buffer.

    Output grain: (doc_id, par_idx, sent_idx) with word- and lemma-level
    overlap counts (NULL for the first sentence of each paragraph).
    """
    tok = _annotated(spark, sf_dir)
    cand = (F.col("is_content") == 1) | (F.col("tag") == "VNW")
    kw = F.when(cand, annotate.overlap_keys_expr(F.col("l_word")))
    kl = F.when(cand, annotate.overlap_keys_expr(F.col("lemma")))
    # candidate key-arrays in document order: collect (idx, keys)
    # structs (collect_list skips NULL non-candidates), sort, project —
    # deterministic regardless of shuffle order; the buffer "set" is the
    # flattened distinct key union of the sentence's candidates
    sent = tok.groupBy("doc_id", "par_idx", "sent_idx").agg(
        F.sort_array(F.collect_list(F.struct("word_idx", kw.alias("v")))).alias("_cw"),
        F.sort_array(F.collect_list(F.struct("word_idx", kl.alias("v")))).alias("_cl"),
        F.array_distinct(F.flatten(F.collect_list(kw))).alias("cand_word_set"),
        F.array_distinct(F.flatten(F.collect_list(kl))).alias("cand_lemma_set"),
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
        F.size(F.filter(F.col(cur), lambda x: F.arrays_overlap(x, F.col(prev)))),
    ).cast("int")
    return sent.select(
        "doc_id",
        "par_idx",
        "sent_idx",
        match_cnt("cand_words", "prev_word_set").alias("word_overlap_cnt"),
        match_cnt("cand_lemmas", "prev_lemma_set").alias("lemma_overlap_cnt"),
    )


def _sql_sentence_overlap() -> str:
    kw = annotate.sql_overlap_keys("l_word")
    kl = annotate.sql_overlap_keys("lemma")
    cand = "(is_content = 1 OR tag = 'VNW')"
    return f"""
SELECT s.doc_id, s.par_idx, s.sent_idx,
       CAST(CASE WHEN s.prev_word_set IS NOT NULL THEN
            len(list_filter(s.cand_words, w -> list_has_any(w, s.prev_word_set)))
       END AS INT) AS word_overlap_cnt,
       CAST(CASE WHEN s.prev_lemma_set IS NOT NULL THEN
            len(list_filter(s.cand_lemmas, w -> list_has_any(w, s.prev_lemma_set)))
       END AS INT) AS lemma_overlap_cnt
FROM (
    SELECT *,
           lag(cand_word_set) OVER (PARTITION BY doc_id, par_idx ORDER BY sent_idx)
               AS prev_word_set,
           lag(cand_lemma_set) OVER (PARTITION BY doc_id, par_idx ORDER BY sent_idx)
               AS prev_lemma_set
    FROM (
        SELECT doc_id, par_idx, sent_idx,
               coalesce(list({kw} ORDER BY word_idx) FILTER (WHERE {cand}),
                        []) AS cand_words,
               coalesce(list({kl} ORDER BY word_idx) FILTER (WHERE {cand}),
                        []) AS cand_lemmas,
               list_distinct(flatten(coalesce(list({kw}) FILTER (WHERE {cand}), [])))
                   AS cand_word_set,
               list_distinct(flatten(coalesce(list({kl}) FILTER (WHERE {cand}), [])))
                   AS cand_lemma_set
        FROM annot
        GROUP BY doc_id, par_idx, sent_idx
    )
) s"""


SQL_SENTENCE_OVERLAP_TMPL = _sql_sentence_overlap()


def doc_sliding_overlap(
    spark: SparkSession, sf_dir: str, overlap_size: int = OVERLAP_SIZE
) -> DataFrame:
    """L2: doc-grain sliding-buffer overlap counts.

    For every candidate token at position >= ``overlap_size``, test
    whether the same l_word (resp. lemma) occurred in the previous
    ``overlap_size`` tokens (buffer holds ALL words; only the *test* is
    candidate-gated, matching src/tscan.cxx:3039-3090; buffer size =
    the reference's configurable ``overlapSize``, default 50).
    """
    tok = _annotated(spark, sf_dir)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("word_idx")
        .rowsBetween(-overlap_size, -1)
    )
    # the buffer holds key arrays of ALL previous words (flattened to a
    # key union); the candidate's keys intersect it on a string match or
    # a shared pronoun-class marker
    tok = tok.withColumn(
        "buf_w",
        F.flatten(F.collect_list(annotate.overlap_keys_expr(F.col("l_word"))).over(w)),
    ).withColumn(
        "buf_l",
        F.flatten(F.collect_list(annotate.overlap_keys_expr(F.col("lemma"))).over(w)),
    )
    eligible = ((F.col("is_content") == 1) | (F.col("tag") == "VNW")) & (
        F.col("word_idx") >= overlap_size
    )
    tok = tok.select(
        "doc_id",
        eligible.cast("int").alias("is_eligible"),
        (eligible & F.arrays_overlap("buf_w", annotate.overlap_keys_expr(F.col("l_word"))))
        .cast("int")
        .alias("hit_w"),
        (eligible & F.arrays_overlap("buf_l", annotate.overlap_keys_expr(F.col("lemma"))))
        .cast("int")
        .alias("hit_l"),
    )
    return tok.groupBy("doc_id").agg(
        F.sum("is_eligible").cast("long").alias("eligible_cnt"),
        F.sum("hit_w").cast("long").alias("word_overlap_cnt"),
        F.sum("hit_l").cast("long").alias("lemma_overlap_cnt"),
    )


def _sql_doc_sliding_overlap() -> str:
    kw = annotate.sql_overlap_keys("l_word")
    kl = annotate.sql_overlap_keys("lemma")
    cand = "(is_content = 1 OR tag = 'VNW')"
    frame = (
        "OVER (PARTITION BY doc_id ORDER BY word_idx "
        "ROWS BETWEEN {n} PRECEDING AND 1 PRECEDING)"
    )
    return f"""
SELECT doc_id,
       CAST(SUM(CASE WHEN eligible THEN 1 ELSE 0 END) AS BIGINT) AS eligible_cnt,
       CAST(SUM(CASE WHEN eligible AND list_has_any(buf_w, kw) THEN 1 ELSE 0 END)
            AS BIGINT) AS word_overlap_cnt,
       CAST(SUM(CASE WHEN eligible AND list_has_any(buf_l, kl) THEN 1 ELSE 0 END)
            AS BIGINT) AS lemma_overlap_cnt
FROM (
    SELECT doc_id,
           {cand} AND word_idx >= {{n}} AS eligible,
           kw, kl,
           flatten(list(kw) {frame}) AS buf_w,
           flatten(list(kl) {frame}) AS buf_l
    FROM (
        SELECT annot.*, {kw} AS kw, {kl} AS kl FROM annot
    )
)
GROUP BY doc_id"""


SQL_DOC_SLIDING_OVERLAP_TMPL = _sql_doc_sliding_overlap()
