"""Frog/CGN positional feature-string source + full decoder (W3/W4 full).

The reference receives each token's part-of-speech as a CGN positional
feature STRING — e.g. ``N(soort,ev,basis)`` / ``WW(pv,tgw)`` /
``VNW(pers,2)`` — and decodes it into the head tag plus named
properties (``CGN::toCGN`` head-tag decode, /root/reference/src/
cgn.cxx:356-383; property accessors over the feature list used
throughout wordstats.cxx).  The engine's battery path consumes
pre-decoded analog props (annotate.py W3/W4); THIS module is the full
format path:

1. ``render`` emits the native feature string for every token — the
   "Frog output" column, built deterministically from the same analog
   rules so the corpus ships a real CGN-shaped annotation layer;
2. ``decode`` parses that string back with pure string expressions
   (regexp_extract head tag, split feature list, positional accessors
   per tag family) — it sees ONLY the string, never the rules;
3. the registered query emits both plus a ``consistent`` flag comparing
   the decoded properties against the independent annotate.py W4 path,
   so the round-trip is oracle-checked end to end.

Everything is whole-stage-codegen string expressions (no UDFs); the
grammar is fixed-arity per tag family, so positional access needs no
backtracking parser — exactly how the reference treats CGN strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import annotate, corpus

# Feature-list grammar per head tag (fixed arity, like CGN):
#   N   (soort, ev|mv, basis)
#   WW  (pv|inf, tgw)
#   ADJ (prenom|vrij, basis)
#   VNW (pers, 1|2|3)
#   other TAG()


def render_expr(word: Column, tag: Column) -> Column:
    """The Frog-analog feature string for a token."""
    w = word
    num = F.when(F.length(w) % 2 == 0, "ev").otherwise("mv")
    vform = F.when(F.length(w) % 2 == 0, "pv").otherwise("inf")
    apos = F.when(F.substring(w, 1, 1) <= "p", "prenom").otherwise("vrij")
    person = (F.length(w) % 3 + 1).cast("string")
    return (
        F.when(tag == "N", F.concat(F.lit("N(soort,"), num, F.lit(",basis)")))
        .when(tag == "WW", F.concat(F.lit("WW("), vform, F.lit(",tgw)")))
        .when(tag == "ADJ", F.concat(F.lit("ADJ("), apos, F.lit(",basis)")))
        .when(tag == "VNW", F.concat(F.lit("VNW(pers,"), person, F.lit(")")))
        .otherwise(F.concat(tag, F.lit("()")))
    )


def sql_render(word: str, tag: str) -> str:
    return f"""CASE
        WHEN {tag} = 'N' THEN 'N(soort,' ||
             CASE WHEN length({word}) % 2 = 0 THEN 'ev' ELSE 'mv' END || ',basis)'
        WHEN {tag} = 'WW' THEN 'WW(' ||
             CASE WHEN length({word}) % 2 = 0 THEN 'pv' ELSE 'inf' END || ',tgw)'
        WHEN {tag} = 'ADJ' THEN 'ADJ(' ||
             CASE WHEN substring({word}, 1, 1) <= 'p' THEN 'prenom' ELSE 'vrij' END
             || ',basis)'
        WHEN {tag} = 'VNW' THEN 'VNW(pers,' ||
             CAST(length({word}) % 3 + 1 AS VARCHAR) || ')'
        ELSE {tag} || '()' END"""


def frog_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render + decode round-trip at token grain.

    Output: doc_id, word_idx, word, feats, main_tag, n_feats, subclass,
    number, verb_form, person, adj_pos, consistent.
    """
    tok = annotate.annotate(
        corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))
    )
    t = tok.select(
        "doc_id",
        "word_idx",
        "word",
        "tag",
        render_expr(F.col("word"), F.col("tag")).alias("feats"),
    )
    main = F.regexp_extract("feats", r"^([A-Z]+)\(", 1)
    inner = F.regexp_extract("feats", r"\((.*)\)", 1)
    parts = F.split(inner, ",")
    n_feats = F.when(inner == "", 0).otherwise(F.size(parts)).cast("int")
    subclass = F.when(inner != "", F.element_at(parts, 1))
    d = t.select(
        "doc_id",
        "word_idx",
        "word",
        "feats",
        "tag",
        main.alias("main_tag"),
        n_feats.alias("n_feats"),
        subclass.alias("subclass"),
        F.when(main == "N", F.element_at(parts, 2)).alias("number"),
        F.when(main == "WW", F.element_at(parts, 1)).alias("verb_form"),
        F.when(main == "VNW", F.element_at(parts, 2).cast("int")).alias("person"),
        F.when(main == "ADJ", F.element_at(parts, 1)).alias("adj_pos"),
    )
    # round-trip consistency vs the independent W3/W4 analog path
    w = F.col("word")
    exp_vform = F.when(
        F.col("tag") == "WW",
        F.when(F.length(w) % 2 == 0, "pv").otherwise("inf"),
    )
    exp_person = F.when(F.col("tag") == "VNW", (F.length(w) % 3 + 1).cast("int"))
    consistent = (
        (F.col("main_tag") == F.col("tag"))
        & (F.col("verb_form").eqNullSafe(exp_vform))
        & (F.col("person").eqNullSafe(exp_person))
    )
    return d.select(
        "doc_id",
        "word_idx",
        "word",
        "feats",
        "main_tag",
        "n_feats",
        "subclass",
        "number",
        "verb_form",
        "person",
        "adj_pos",
        consistent.alias("consistent"),
    )


def sql_frog_decode() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + annotate.sql_annot_cte().strip()
        + f""",
rendered AS (
    SELECT doc_id, word_idx, word, tag,
           {sql_render("word", "tag")} AS feats
    FROM annot
),
decoded AS (
    SELECT doc_id, word_idx, word, tag, feats,
           regexp_extract(feats, '^([A-Z]+)\\(', 1) AS main_tag,
           regexp_extract(feats, '\\((.*)\\)', 1) AS flist
    FROM rendered
),
parsed AS (
    SELECT doc_id, word_idx, word, tag, feats, main_tag,
           CASE WHEN flist = '' THEN 0
                ELSE CAST(len(string_split(flist, ',')) AS INT) END AS n_feats,
           CASE WHEN flist <> '' THEN string_split(flist, ',')[1] END AS subclass,
           CASE WHEN main_tag = 'N' THEN string_split(flist, ',')[2] END AS number,
           CASE WHEN main_tag = 'WW' THEN string_split(flist, ',')[1] END
               AS verb_form,
           CASE WHEN main_tag = 'VNW'
                THEN CAST(string_split(flist, ',')[2] AS INT) END AS person,
           CASE WHEN main_tag = 'ADJ' THEN string_split(flist, ',')[1] END
               AS adj_pos
    FROM decoded
)
SELECT doc_id, word_idx, word, feats, main_tag, n_feats, subclass, number,
       verb_form, person, adj_pos,
       (main_tag = tag
        AND verb_form IS NOT DISTINCT FROM
            (CASE WHEN tag = 'WW' THEN
                 CASE WHEN length(word) % 2 = 0 THEN 'pv' ELSE 'inf' END END)
        AND person IS NOT DISTINCT FROM
            (CASE WHEN tag = 'VNW' THEN CAST(length(word) % 3 + 1 AS INT) END))
       AS consistent
FROM parsed"""
    )
