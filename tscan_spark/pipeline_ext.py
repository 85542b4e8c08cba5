"""Extended T-Scan document features (SURVEY.md §2.2 W4/W7/W10-W16/
W24-W26, §2.7 D4/D8/D9).

Builds on the extended annotation battery: semantic-type fan-out
counters (the reference's switch fan-out src/tscan.cxx:2402-2606),
strict-content variants (Adverb-gated, src/wordstats.cxx:17-33),
morphological negation + multiNeg sentence flags (src/tscan.cxx:
2826-2827), nominalizations, compounds (char counts, src/tscan.cxx:
1786-1798), personal references, verb-form counts, question count
(src/tscan.cxx:2824-2825 analog: sentence-final interrogative token),
and a LiNT-style readability score with clamp + level bands
(src/structstats.cxx:1004-1041).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import annotate, corpus
from tscan_spark.functions.scalars import proportion, sql_proportion

SEM_CLASSES = ["CONCRETE", "ABSTRACT", "HUMAN"]
ADV_CLASSES = ["GENERAL", "MANNER"]
# W16 per-domain abbreviation fan-out (Afk_*_d columns, wordSortHeader
# structstats.cxx:883-920; the reference carries 8 Frog domains, the
# synthetic analog lexicon labels 2 — the fan-out mechanism is the same)
AFK_CLASSES = ["TECH", "OVERIG"]
QUESTION_WORD = "query"  # sentence-final token marking a "question"

# LiNT-style linear model on engine features (weights synthetic; the
# reference's exact weights live at structstats.cxx:1004-1041 and apply
# to Dutch-specific predictors we replace with our analogs)
LINT = {"intercept": 3.204, "wfl": 15.845, "wrd_per_zin": -1.331, "content_d": -3.829}
LINT_LEVELS = [34.0, 46.0, 60.0]


def word_features_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = annotate.annotate(corpus.tokens_long(corpus.load(spark, sf_dir, "documents")))
    return annotate.annotate_extended(tok)


def doc_features_ext(
    spark: SparkSession, sf_dir: str, wordf: DataFrame | None = None
) -> DataFrame:
    # not persisted: pure codegen projection (cheap recompute), and a
    # library-side persist leaks cache to the caller (verdict #10).
    # `wordf` lets the unified doc profile share one analyzed grain.
    if wordf is None:
        wordf = word_features_ext(spark, sf_dir)

    # sentence grain: multiNeg (D8) + question flag (D9). The
    # sentence-final token comes from max_by INSIDE the same aggregate —
    # no row_number window sort, no extra join (round-1 verdict #9).
    sent = wordf.groupBy("doc_id", "sent_idx").agg(
        F.sum("is_neg").alias("_prop_neg"),
        F.sum("is_morph_neg").alias("_morph_neg"),
        (F.max_by("word", "word_idx") == QUESTION_WORD).cast("int").alias("_is_q"),
    )
    sent = sent.withColumn(
        "_multi_neg", ((F.col("_prop_neg") + F.col("_morph_neg")) > 1).cast("int")
    )
    sent_doc = sent.groupBy("doc_id").agg(
        F.sum("_multi_neg").alias("multi_neg_cnt"),
        F.sum("_is_q").alias("question_cnt"),
        F.count(F.lit(1)).alias("sent_cnt"),
    )

    doc = wordf.groupBy("doc_id").agg(*_ext_aggs())
    out = doc.join(sent_doc, "doc_id")
    return out.select(*_ext_select_cols())


@lru_cache(maxsize=None)
def _ext_aggs() -> tuple:
    """Doc-grain extended-battery aggregates, built once per process
    (constant Column trees; per-call rebuild was py4j round trips)."""
    aggs = [
        F.count(F.lit(1)).alias("word_cnt"),
        F.sum("is_morph_neg").alias("morph_neg_cnt"),
        F.sum("is_nominal").alias("nominal_cnt"),
        F.sum("is_compound").alias("compound_cnt"),
        F.sum("is_pers_ref").alias("pers_ref_cnt"),
        F.sum("is_content_strict").alias("content_strict_cnt"),
        F.sum(F.coalesce("comp_head_len", F.lit(0))).alias("comp_char_sum"),
        F.countDistinct(
            F.when(F.col("is_content_strict") == 1, F.col("lemma"))
        ).alias("uniq_strict_lemmas"),
        F.sum(F.when(F.col("verb_form") == "pv", 1).otherwise(0)).alias("pv_cnt"),
        F.sum(F.when(F.col("verb_form") == "inf", 1).otherwise(0)).alias("inf_cnt"),
        F.sum(F.when(F.col("adj_pos") == "prenom", 1).otherwise(0)).alias("prenom_cnt"),
        F.sum(F.col("afk_domain").isNotNull().cast("int")).alias("afk_cnt"),
        F.sum("is_content").alias("_content_incl"),
        F.sum("char_cnt").alias("_char_sum"),
    ]
    for c in SEM_CLASSES:
        aggs.append(
            F.sum(F.when(F.col("noun_sem") == c, 1).otherwise(0)).alias(
                f"sem_{c.lower()}_cnt"
            )
        )
    for c in ADV_CLASSES:
        aggs.append(
            F.sum(F.when(F.col("adverb_type") == c, 1).otherwise(0)).alias(
                f"adv_{c.lower()}_cnt"
            )
        )
    for c in AFK_CLASSES:
        aggs.append(
            F.sum(F.when(F.col("afk_domain") == c, 1).otherwise(0)).alias(
                f"afk_{c.lower()}_cnt"
            )
        )
    return tuple(aggs)


@lru_cache(maxsize=None)
def _ext_select_cols() -> tuple:
    r6 = lambda c: F.round(c, 6)
    wrd_per_zin = F.col("word_cnt") / F.col("sent_cnt")
    content_ratio = F.col("content_strict_cnt") / F.col("word_cnt")
    # LiNT-style score uses let_per_wrd as the word-frequency proxy
    wfl_proxy = F.col("_char_sum") / F.col("word_cnt")
    raw = (
        100.0
        - (
            LINT["intercept"]
            + LINT["wfl"] * wfl_proxy
            + LINT["wrd_per_zin"] * wrd_per_zin
            + LINT["content_d"] * content_ratio
        )
    )
    lint = F.greatest(F.lit(0.0), F.least(F.lit(100.0), raw))
    level = (
        F.when(lint < LINT_LEVELS[0], 1)
        .when(lint < LINT_LEVELS[1], 2)
        .when(lint < LINT_LEVELS[2], 3)
        .otherwise(4)
    )

    count_cols = (
        [
            "word_cnt",
            "morph_neg_cnt",
            "nominal_cnt",
            "compound_cnt",
            "pers_ref_cnt",
            "content_strict_cnt",
            "comp_char_sum",
            "uniq_strict_lemmas",
            "pv_cnt",
            "inf_cnt",
            "prenom_cnt",
            "afk_cnt",
        ]
        + [f"sem_{c.lower()}_cnt" for c in SEM_CLASSES]
        + [f"adv_{c.lower()}_cnt" for c in ADV_CLASSES]
        + [f"afk_{c.lower()}_cnt" for c in AFK_CLASSES]
        + ["multi_neg_cnt", "question_cnt", "sent_cnt"]
    )
    return (
        F.col("doc_id").cast("long").alias("doc_id"),
        *[F.col(c).cast("long").alias(c) for c in count_cols],
        r6(proportion("uniq_strict_lemmas", "content_strict_cnt")).alias("ttr_strict"),
        r6(proportion(F.col("morph_neg_cnt") * 1000.0, "word_cnt")).alias("morph_neg_d"),
        r6(proportion(F.col("nominal_cnt") * 1000.0, "word_cnt")).alias("nominal_d"),
        r6(proportion(F.col("pers_ref_cnt") * 1000.0, "word_cnt")).alias("pers_ref_d"),
        r6(lint).alias("lint_score"),
        level.cast("int").alias("lint_level"),
    )


def sql_doc_features_ext() -> str:
    sem_sums = ",\n           ".join(
        f"SUM(CASE WHEN noun_sem = '{c}' THEN 1 ELSE 0 END) AS sem_{c.lower()}_cnt"
        for c in SEM_CLASSES
    )
    adv_sums = ",\n           ".join(
        f"SUM(CASE WHEN adverb_type = '{c}' THEN 1 ELSE 0 END) AS adv_{c.lower()}_cnt"
        for c in ADV_CLASSES
    )
    afk_sums = ",\n           ".join(
        f"SUM(CASE WHEN afk_domain = '{c}' THEN 1 ELSE 0 END) AS afk_{c.lower()}_cnt"
        for c in AFK_CLASSES
    )
    count_cols = (
        [
            "word_cnt",
            "morph_neg_cnt",
            "nominal_cnt",
            "compound_cnt",
            "pers_ref_cnt",
            "content_strict_cnt",
            "comp_char_sum",
            "uniq_strict_lemmas",
            "pv_cnt",
            "inf_cnt",
            "prenom_cnt",
            "afk_cnt",
        ]
        + [f"sem_{c.lower()}_cnt" for c in SEM_CLASSES]
        + [f"adv_{c.lower()}_cnt" for c in ADV_CLASSES]
        + [f"afk_{c.lower()}_cnt" for c in AFK_CLASSES]
        + ["multi_neg_cnt", "question_cnt", "sent_cnt"]
    )
    longs = ",\n       ".join(f"CAST({c} AS BIGINT) AS {c}" for c in count_cols)
    lint_raw = (
        f"100.0 - ({LINT['intercept']} + {LINT['wfl']} * (_char_sum * 1.0 / word_cnt) "
        f"+ ({LINT['wrd_per_zin']}) * (word_cnt * 1.0 / sent_cnt) "
        f"+ ({LINT['content_d']}) * (content_strict_cnt * 1.0 / word_cnt))"
    )
    lint = f"GREATEST(0.0, LEAST(100.0, {lint_raw}))"
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + annotate.sql_annot_cte().strip()
        + ",\n"
        + annotate.sql_annot_ext_cte().strip()
        + f""",
sentg AS (
    SELECT doc_id, sent_idx,
           SUM(is_neg) AS prop_neg,
           SUM(is_morph_neg) AS morph_neg,
           CASE WHEN (list(word ORDER BY word_idx DESC))[1] = '{QUESTION_WORD}'
                THEN 1 ELSE 0 END AS is_q
    FROM annot_ext
    GROUP BY doc_id, sent_idx
),
sent_doc AS (
    SELECT doc_id,
           SUM(CASE WHEN prop_neg + morph_neg > 1 THEN 1 ELSE 0 END) AS multi_neg_cnt,
           SUM(is_q) AS question_cnt,
           COUNT(*) AS sent_cnt
    FROM sentg GROUP BY doc_id
),
docg AS (
    SELECT doc_id,
           COUNT(*) AS word_cnt,
           SUM(is_morph_neg) AS morph_neg_cnt,
           SUM(is_nominal) AS nominal_cnt,
           SUM(is_compound) AS compound_cnt,
           SUM(is_pers_ref) AS pers_ref_cnt,
           SUM(is_content_strict) AS content_strict_cnt,
           SUM(COALESCE(comp_head_len, 0)) AS comp_char_sum,
           COUNT(DISTINCT CASE WHEN is_content_strict = 1 THEN lemma END)
               AS uniq_strict_lemmas,
           SUM(CASE WHEN verb_form = 'pv' THEN 1 ELSE 0 END) AS pv_cnt,
           SUM(CASE WHEN verb_form = 'inf' THEN 1 ELSE 0 END) AS inf_cnt,
           SUM(CASE WHEN adj_pos = 'prenom' THEN 1 ELSE 0 END) AS prenom_cnt,
           SUM(CASE WHEN afk_domain IS NOT NULL THEN 1 ELSE 0 END) AS afk_cnt,
           SUM(is_content) AS _content_incl,
           SUM(char_cnt) AS _char_sum,
           {sem_sums},
           {adv_sums},
           {afk_sums}
    FROM annot_ext
    GROUP BY doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {longs},
       ROUND({sql_proportion("uniq_strict_lemmas", "content_strict_cnt")}, 6)
           AS ttr_strict,
       ROUND({sql_proportion("morph_neg_cnt * 1000.0", "word_cnt")}, 6) AS morph_neg_d,
       ROUND({sql_proportion("nominal_cnt * 1000.0", "word_cnt")}, 6) AS nominal_d,
       ROUND({sql_proportion("pers_ref_cnt * 1000.0", "word_cnt")}, 6) AS pers_ref_d,
       ROUND({lint}, 6) AS lint_score,
       CAST(CASE WHEN {lint} < {LINT_LEVELS[0]} THEN 1
                 WHEN {lint} < {LINT_LEVELS[1]} THEN 2
                 WHEN {lint} < {LINT_LEVELS[2]} THEN 3
                 ELSE 4 END AS INT) AS lint_level
FROM docg JOIN sent_doc USING (doc_id)"""
    )
