"""Annotation dimension table consumed as INPUT (S2, the reference's
real Frog contract) + the classifiers it unblocks (W5 morphemes,
W14 general nouns/verbs, W17 user classification).

The reference does not compute tags/lemmas/morphemes itself — Frog
supplies them per word and T-scan *consumes* them
(/root/reference/src/tscan.cxx:3131-3231; the per-word inputs are the
FIXTURES.md §2 ``vocab`` dimension: word, lemma, cgn_tag, pos_features,
morphemes, compound_str).  Round 1 synthesized every annotation inline
from the surface word; this module restores the real data shape:

1. :func:`build_vocab_dim` materializes the dimension table — one row
   per DISTINCT word, annotations evaluated ONCE over the vocabulary
   (at production scale this is a prebuilt Iceberg snapshot, exactly
   like the frequency lexicons).
2. :func:`annotate_from_dim` broadcast-joins tokens against the dim and
   takes tag/lemma/char_cnt/morphemes FROM THE DIM COLUMNS — the engine
   never re-derives them from the surface form on the fact-table side.

Because the dim is vocabulary-sized (<< corpus), the join is a single
broadcast hash join: scan-parallel, no shuffle of the token grain.

Morpheme rule (deterministic, replayed in the oracle): a word starting
with a morphological-negation prefix splits [prefix, rest]; else a
compound noun splits [head, satellite]; else the word is a single
morpheme.  This gives W7 its *real* first-morpheme guard
(checkMorphNeg src/wordstats.cxx:288-305: the first morpheme must be on
the negation list) instead of the round-1 whole-word prefix test.

General nouns (W14, /root/reference/src/general.cxx): lemma -> one of
the reference's 25 General::Type classes; the 6 derived booleans
(isSeparate / isRelated / isActing / isKnowledge / isDiscussion /
isDevelopment, general.cxx:147-244) are class-set memberships, mirrored
here with the reference's exact set definitions over a synthetic
lemma->class map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import annotate, corpus
from tscan_spark.functions.scalars import (
    density,
    proportion,
    sql_density,
    sql_proportion,
)

# ---------------------------------------------------------------------------
# W14 general-noun classes: the reference's Type taxonomy (general.h) and
# its derived set predicates (general.cxx:147-244), over a synthetic
# lemma -> class map.
# ---------------------------------------------------------------------------

GENERAL_NOUNS = {
    "fact": "FACTUAL_CORRECTNESS",
    "idea": "THOUGHT_POSITION",
    "info": "INFORMATION",
    "event": "EVENT",
    "state": "STATE",
    "problem": "PROBLEM_SOLUTION",
    "goal": "REACHING_GOALS",
    "cause": "REASONING_CAUSALITY",
    "change": "DEVELOPMENT_STABILITY",
    "talk": "DISCUSSION",
    # corpus-plausible synthetic lemmas (the testdata vocabulary):
    "filter": "CONCEPT_SYSTEM",
    "batch": "STRUCTURE",
    "stream": "DEVELOPMENT_STABILITY",
    "group": "ADDITION_ALTERNATIVE",
    "order": "ACTS_CHOICES",
}

# class sets lifted from general.cxx:147-244 (exact memberships)
GENERAL_SEPARATE = {
    "IMPORTANCE_INTEREST", "CONCEPT_SYSTEM", "FACTUAL_CORRECTNESS",
    "THOUGHT_POSITION", "INFORMATION", "INTERPRETATION", "KNOWLEDGE",
    "OPPORTUNITY", "DESIRABILITY", "PHRASING", "DESCRIPTION",
    "EXISTENCE", "EVENT", "STATE", "GRADATION",
}
GENERAL_RELATED = {
    "ADDITION_ALTERNATIVE", "CONTRAST_VARIATION", "DISCUSSION",
    "REACHING_GOALS", "ACTS_CHOICES", "MEANS_GOAL",
    "DEVELOPMENT_STABILITY", "PROBLEM_SOLUTION", "REASONING_CAUSALITY",
    "STRUCTURE",
}
GENERAL_ACTING = {"REACHING_GOALS", "ACTS_CHOICES", "MEANS_GOAL", "PROBLEM_SOLUTION"}
GENERAL_KNOWLEDGE = {
    "CONCEPT_SYSTEM", "FACTUAL_CORRECTNESS", "THOUGHT_POSITION",
    "INFORMATION", "INTERPRETATION", "KNOWLEDGE", "DISCUSSION",
    "REASONING_CAUSALITY",
}
GENERAL_DISCUSSION = {"DISCUSSION", "REASONING_CAUSALITY"}
GENERAL_DEVELOPMENT = {"DEVELOPMENT_STABILITY"}

GENERAL_BOOLS = [
    ("gen_separate", GENERAL_SEPARATE),
    ("gen_related", GENERAL_RELATED),
    ("gen_acting", GENERAL_ACTING),
    ("gen_knowledge", GENERAL_KNOWLEDGE),
    ("gen_discussion", GENERAL_DISCUSSION),
    ("gen_development", GENERAL_DEVELOPMENT),
]

# W14 general verbs (fill_general over the verb file): lemma -> class
GENERAL_VERBS = {
    "merge": "ACTS_CHOICES",
    "update": "DEVELOPMENT_STABILITY",
    "insert": "ACTS_CHOICES",
    "hash": "MEANS_GOAL",
}

# W17 user classification (checkMyClassification, tscan.cxx:815-860):
# free-form lemma -> label supplied by the user
MY_CLASSIFICATION = {
    "query": "DOMAIN_CORE",
    "table": "DOMAIN_CORE",
    "window": "DOMAIN_API",
    "vector": "DOMAIN_MATH",
}


# ---------------------------------------------------------------------------
# The dimension table (FIXTURES.md §2 shape)
# ---------------------------------------------------------------------------


# morpheme split rules moved to annotate.py (shared with the W24 full
# nominalization arms); re-exported here for the dimension builders.
morphemes_expr = annotate.morphemes_expr
sql_morphemes = annotate.sql_morphemes


def build_vocab_dim(documents: DataFrame) -> DataFrame:
    """The annotation dimension: one row per distinct word, the
    FIXTURES.md §2 columns (annotations evaluated once, vocabulary-
    sized, always broadcastable)."""
    w = F.col("word")
    tag = annotate.tag_expr(w)
    v = (
        corpus.tokens_long(documents)
        .select("word")
        .distinct()
        .select(
            corpus.content_hash_expr("word").cast("int").alias("token_id"),
            "word",
            F.lower(w).alias("l_word"),
            annotate.lemma_expr(w).alias("lemma"),
            tag.alias("cgn_tag"),
            F.length(w).cast("int").alias("char_cnt"),
        )
    )
    v = v.withColumn("morphemes", morphemes_expr(F.col("word"), F.col("cgn_tag")))
    is_comp = (F.col("cgn_tag") == "N") & (
        F.length("word") >= annotate.COMPOUND_MIN_LEN
    )
    v = v.withColumn(
        "compound_str",
        F.when(is_comp, F.concat_ws("_", F.col("morphemes"))),
    )
    # pos_features: the W4 CGN property string (wvorm/persoon/positie)
    v = v.withColumn(
        "pos_features",
        F.when(
            F.col("cgn_tag") == "WW",
            F.concat(
                F.lit("wvorm="),
                F.when(F.length("word") % 2 == 0, "pv").otherwise("inf"),
            ),
        )
        .when(
            F.col("cgn_tag") == "VNW",
            F.concat(F.lit("persoon="), (F.length("word") % 3 + 1).cast("string")),
        )
        .when(
            F.col("cgn_tag") == "ADJ",
            F.concat(
                F.lit("positie="),
                F.when(F.substring("word", 1, 1) <= "p", "prenom").otherwise("vrij"),
            ),
        ),
    )
    return v


SQL_VOCAB_DIM_CTE = None  # rendered lazily (needs annotate SQL helpers)


def sql_vocab_dim_cte() -> str:
    tag = annotate.sql_tag("word")
    return f"""
vdim AS (
    SELECT CAST({corpus.sql_content_hash("word")} AS INT) AS token_id,
           word,
           lower(word) AS l_word,
           {annotate.sql_lemma("word")} AS lemma,
           {tag} AS cgn_tag,
           CAST(length(word) AS INT) AS char_cnt,
           {sql_morphemes("word", tag)} AS morphemes,
           CASE WHEN ({tag}) = 'N' AND length(word) >= {annotate.COMPOUND_MIN_LEN}
                THEN array_to_string({sql_morphemes("word", tag)}, '_') END
               AS compound_str,
           CASE WHEN ({tag}) = 'WW' THEN 'wvorm=' ||
                     CASE WHEN length(word) % 2 = 0 THEN 'pv' ELSE 'inf' END
                WHEN ({tag}) = 'VNW' THEN 'persoon=' ||
                     CAST(length(word) % 3 + 1 AS VARCHAR)
                WHEN ({tag}) = 'ADJ' THEN 'positie=' ||
                     CASE WHEN substring(word, 1, 1) <= 'p'
                          THEN 'prenom' ELSE 'vrij' END
                END AS pos_features
    FROM (SELECT DISTINCT word FROM tok)
)"""


# ---------------------------------------------------------------------------
# Consuming the dim: annotate FROM input columns
# ---------------------------------------------------------------------------


def annotate_from_dim(tok: DataFrame, dim: DataFrame) -> DataFrame:
    """Token grain annotated by broadcast-joining the dimension —
    tag/lemma/char_cnt/morphemes are CONSUMED, not re-derived (the S2
    contract, tscan.cxx:3131-3231).  Downstream classifiers operate on
    the dim columns only."""
    t = tok.join(
        F.broadcast(dim.select(
            "word", "l_word", "lemma", "cgn_tag", "char_cnt", "morphemes",
            "compound_str", "pos_features",
        )),
        "word",
    )
    lem, tag = F.col("lemma"), F.col("cgn_tag")
    out = (
        t.withColumn("morph_cnt", F.size("morphemes").cast("int"))
        .withColumn("first_morph", F.col("morphemes")[0])
        # W7 with the REAL first-morpheme guard: >1 morphemes AND the
        # first one is on the negation-prefix list
        .withColumn(
            "is_morph_neg_strict",
            (
                (F.size("morphemes") > 1)
                & F.col("morphemes")[0].isin(annotate.MORPH_NEG_PREFIXES)
            ).cast("int"),
        )
        # W14 general nouns/verbs on the dim lemma, tag-gated
        .withColumn(
            "general_noun_type",
            F.when(tag == "N", annotate.lexicon_map(GENERAL_NOUNS, lem)),
        )
        .withColumn(
            "general_verb_type",
            F.when(tag == "WW", annotate.lexicon_map(GENERAL_VERBS, lem)),
        )
        # W17 user classification (lemma -> label)
        .withColumn("my_class", annotate.lexicon_map(MY_CLASSIFICATION, lem))
    )
    for name, cls_set in GENERAL_BOOLS:
        out = out.withColumn(
            name,
            F.coalesce(
                F.col("general_noun_type").isin(sorted(cls_set)).cast("int"), F.lit(0)
            ),
        )
    return out


def word_features_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dim-consuming word-feature query (registered witness)."""
    documents = corpus.load(spark, sf_dir, "documents")
    tok = corpus.tokens_long(documents)
    dim = build_vocab_dim(documents)
    out = annotate_from_dim(tok, dim)
    return out.select(
        "doc_id",
        "sent_idx",
        "word_idx",
        "word",
        "lemma",
        "cgn_tag",
        F.col("char_cnt").cast("int").alias("char_cnt"),
        "pos_features",
        "compound_str",
        "morph_cnt",
        "first_morph",
        "is_morph_neg_strict",
        "general_noun_type",
        "general_verb_type",
        "my_class",
        *[F.col(n) for n, _ in GENERAL_BOOLS],
    )


def sql_word_features_dim() -> str:
    gen_bools = ",\n           ".join(
        "CASE WHEN (CASE WHEN cgn_tag = 'N' THEN "
        + annotate.sql_case_map("lemma", GENERAL_NOUNS)
        + f" END) IN ({', '.join(repr(c) for c in sorted(cls))}) "
        f"THEN 1 ELSE 0 END AS {name}"
        for name, cls in GENERAL_BOOLS
    )
    morph_neg = ", ".join(f"'{p}'" for p in annotate.MORPH_NEG_PREFIXES)
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + sql_vocab_dim_cte().strip()
        + f"""
SELECT t.doc_id, t.sent_idx, t.word_idx, t.word,
       v.lemma, v.cgn_tag, v.char_cnt, v.pos_features, v.compound_str,
       CAST(len(v.morphemes) AS INT) AS morph_cnt,
       v.morphemes[1] AS first_morph,
       CASE WHEN len(v.morphemes) > 1 AND v.morphemes[1] IN ({morph_neg})
            THEN 1 ELSE 0 END AS is_morph_neg_strict,
       CASE WHEN v.cgn_tag = 'N'
            THEN {annotate.sql_case_map("v.lemma", GENERAL_NOUNS)} END
           AS general_noun_type,
       CASE WHEN v.cgn_tag = 'WW'
            THEN {annotate.sql_case_map("v.lemma", GENERAL_VERBS)} END
           AS general_verb_type,
       {annotate.sql_case_map("v.lemma", MY_CLASSIFICATION)} AS my_class,
       {gen_bools}
FROM tok t JOIN vdim v USING (word)"""
    )


def general_doc_features(
    spark: SparkSession, sf_dir: str, tok: DataFrame | None = None
) -> DataFrame:
    """W14 doc battery: per-class general-noun/verb counts + the 6
    derived boolean counters (generalMergeCounts analog)."""
    documents = corpus.load(spark, sf_dir, "documents")
    if tok is None:
        tok = corpus.tokens_long(documents)
    out = annotate_from_dim(
        tok.select("doc_id", "sent_idx", "word_idx", "word"),
        build_vocab_dim(documents),
    )
    aggs = [
        F.sum(F.when(F.col("general_noun_type").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("general_noun_cnt"),
        F.sum(F.when(F.col("general_verb_type").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("general_verb_cnt"),
        F.sum(F.when(F.col("my_class").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("my_class_cnt"),
        F.sum("is_morph_neg_strict").cast("long").alias("morph_neg_strict_cnt"),
    ]
    aggs += [F.sum(n).cast("long").alias(f"{n}_cnt") for n, _ in GENERAL_BOOLS]
    # morpheme block (wordDifficultiesToCSV Morf_per_wrd/Wrd_per_morf +
    # noun variants, structstats.cxx:197-202) over the DIM morphemes
    tag = F.col("cgn_tag")
    aggs += [
        F.sum("morph_cnt").cast("long").alias("morph_sum"),
        F.sum(F.when(tag == "N", F.col("morph_cnt")).otherwise(0))
        .cast("long")
        .alias("morph_noun_sum"),
        F.sum(F.when(tag == "N", 1).otherwise(0)).cast("long").alias("noun_dim_cnt"),
    ]
    doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("word_cnt"), *aggs
    )
    r6 = lambda c: F.round(c, 6)
    return doc.select(
        "*",
        r6(proportion("morph_sum", "word_cnt")).alias("morf_per_wrd"),
        r6(proportion("word_cnt", "morph_sum")).alias("wrd_per_morf"),
        r6(proportion("morph_noun_sum", "noun_dim_cnt")).alias("morf_per_wrd_nw"),
        r6(proportion("noun_dim_cnt", "morph_noun_sum")).alias("wrd_per_morf_nw"),
        # Alg_nw_d / Alg_ww_d top predictors (structstats.cxx:192)
        r6(density("general_noun_cnt", "word_cnt")).alias("alg_nw_d"),
        r6(density("general_verb_cnt", "word_cnt")).alias("alg_ww_d"),
    )


def sql_general_doc_features() -> str:
    base = sql_word_features_dim()
    bool_sums = ",\n       ".join(
        f"CAST(SUM({n}) AS BIGINT) AS {n}_cnt" for n, _ in GENERAL_BOOLS
    )
    return f"""
WITH dimw AS ({base}),
dimdoc AS (
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS word_cnt,
       CAST(SUM(CASE WHEN general_noun_type IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS general_noun_cnt,
       CAST(SUM(CASE WHEN general_verb_type IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS general_verb_cnt,
       CAST(SUM(CASE WHEN my_class IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS my_class_cnt,
       CAST(SUM(is_morph_neg_strict) AS BIGINT) AS morph_neg_strict_cnt,
       {bool_sums},
       CAST(SUM(morph_cnt) AS BIGINT) AS morph_sum,
       CAST(SUM(CASE WHEN cgn_tag = 'N' THEN morph_cnt ELSE 0 END) AS BIGINT)
           AS morph_noun_sum,
       CAST(SUM(CASE WHEN cgn_tag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
           AS noun_dim_cnt
FROM dimw
GROUP BY doc_id
)
SELECT dimdoc.*,
       ROUND({sql_proportion("morph_sum", "word_cnt")}, 6) AS morf_per_wrd,
       ROUND({sql_proportion("word_cnt", "morph_sum")}, 6) AS wrd_per_morf,
       ROUND({sql_proportion("morph_noun_sum", "noun_dim_cnt")}, 6)
           AS morf_per_wrd_nw,
       ROUND({sql_proportion("noun_dim_cnt", "morph_noun_sum")}, 6)
           AS wrd_per_morf_nw,
       ROUND({sql_density("general_noun_cnt", "word_cnt")}, 6) AS alg_nw_d,
       ROUND({sql_density("general_verb_cnt", "word_cnt")}, 6) AS alg_ww_d
FROM dimdoc"""
