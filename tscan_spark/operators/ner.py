"""Named-entity + NP-chunk operators (SURVEY.md §2.2 W27, §2.4 J4,
§2.5 A11).

The reference reads Frog NER entity spans from the FoLiA document and
classifies every word by scanning the sentence's entity list
(``NER::lookupNer`` /root/reference/src/ner.cxx:8-41: position 0 in the
span -> ``*_B``, later positions -> ``*_I``, else NONER), then counts
per-class tokens at sentence grain.  NP chunk spans feed ``np_length``
(/root/reference/src/tscan.cxx:2105-2124: per sentence, count NP chunks,
sum their sizes, and count chunks whose determiner token is the
indefinite article).

The engine consumes *pre-annotated* span sidecars (FIXTURES.md §3
``ner`` / ``chunks`` tables).  The testdata ships none, so
:func:`synth_entity_spans` / :func:`synth_np_chunks` derive
deterministic spans from the token stream (same single-source-of-truth
trick as the synthetic Frog, rendered into both Spark and the DuckDB
oracle):

- entity member:  ``length(word) >= NER_MIN_LEN``
- entity span:    maximal run of consecutive member tokens in a sentence
- entity class:   first letter of the span's FIRST word
                  (a-f PER, g-m LOC, n-r ORG, s-u EVE, else MISC)
- NP chunk:       maximal run of tokens with tag in (N, ADJ)
- indefinite NP:  the token immediately before the chunk is the
                  synthetic indefinite article ('a' — mirrors the
                  ``det->text() == "een"`` check)

Scale notes (100 TB): span construction is one window pass partitioned
by (doc_id, sent_idx) — key cardinality ~= sentence count, perfectly
parallel, bounded group size (sentence length).  The span->token
lookup (J4) is an *interval join*: equi keys (doc_id, sent_idx) plus a
``BETWEEN`` range predicate; Spark plans it as a shuffled equi-join with
the range as a post-join filter — co-partitioned on the sentence key, no
broadcast needed, no skew (spans per sentence are bounded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import annotate, corpus

NER_MIN_LEN = 6  # tokens at least this long are entity members

# first letter of the span's first word -> NER class
# (NER::Type, /root/reference/include/tscan/ner.h:11-19 — LOC/EVE/ORG/
#  MISC/PER/PRO each with _B/_I variants; PRO has no synthetic analog)
NER_CLASS_BANDS = [
    ("a", "f", "PER"),
    ("g", "m", "LOC"),
    ("n", "r", "ORG"),
    ("s", "u", "EVE"),
]
NER_CLASSES = ["PER", "LOC", "ORG", "EVE", "MISC"]

INDEF_ARTICLE = "a"  # the synthetic 'een' (np_length, tscan.cxx:2116-2119)


def _ner_class_expr(word: Column) -> Column:
    first = F.substring(word, 1, 1)
    expr: Column = F.lit("MISC")
    for lo, hi, cls in reversed(NER_CLASS_BANDS):
        expr = F.when((first >= lo) & (first <= hi), cls).otherwise(expr)
    return expr


def _sql_ner_class(col: str) -> str:
    cases = " ".join(
        f"WHEN substring({col}, 1, 1) BETWEEN '{lo}' AND '{hi}' THEN '{cls}'"
        for lo, hi, cls in NER_CLASS_BANDS
    )
    return f"CASE {cases} ELSE 'MISC' END"


def synth_entity_spans(tok: DataFrame) -> DataFrame:
    """Deterministic entity-span sidecar (FIXTURES.md §3 ``ner`` shape,
    span form): (doc_id, sent_idx, ent_idx, tok_begin, tok_end,
    ner_type, ent_len).

    Runs are found with one lag + running-sum window over the sentence
    key — the standard sessionize shape: partition cardinality =
    sentences, group size bounded by sentence length.
    """
    w = Window.partitionBy("doc_id", "sent_idx").orderBy("word_idx")
    member = F.length("word") >= NER_MIN_LEN
    t = tok.withColumn("_m", member.cast("int"))
    t = t.withColumn(
        "_new", ((F.col("_m") == 1) & (F.coalesce(F.lag("_m").over(w), F.lit(0)) == 0)).cast("int")
    )
    t = t.withColumn("_run", F.sum("_new").over(w)).where(F.col("_m") == 1)
    spans = t.groupBy("doc_id", "sent_idx", "_run").agg(
        F.min("word_idx").alias("tok_begin"),
        F.max("word_idx").alias("tok_end"),
        F.min_by("word", "word_idx").alias("_first_word"),
        F.count(F.lit(1)).cast("int").alias("ent_len"),
    )
    return spans.select(
        "doc_id",
        "sent_idx",
        (F.col("_run") - 1).cast("int").alias("ent_idx"),
        F.col("tok_begin").cast("int"),
        F.col("tok_end").cast("int"),
        _ner_class_expr(F.col("_first_word")).alias("ner_type"),
        "ent_len",
    )


SQL_ENTITY_SPANS_CTE = f"""
nert AS (
    SELECT tok.*,
           CASE WHEN length(word) >= {NER_MIN_LEN} THEN 1 ELSE 0 END AS m
    FROM tok
),
nerr AS (
    SELECT *,
           CASE WHEN m = 1 AND COALESCE(LAG(m) OVER (
                    PARTITION BY doc_id, sent_idx ORDER BY word_idx), 0) = 0
                THEN 1 ELSE 0 END AS new_run
    FROM nert
),
nerg AS (
    SELECT *,
           SUM(new_run) OVER (PARTITION BY doc_id, sent_idx
                              ORDER BY word_idx) AS run_id
    FROM nerr
),
ner_spans AS (
    SELECT doc_id, sent_idx,
           CAST(run_id - 1 AS INT) AS ent_idx,
           CAST(MIN(word_idx) AS INT) AS tok_begin,
           CAST(MAX(word_idx) AS INT) AS tok_end,
           {_sql_ner_class("MIN_BY(word, word_idx)")} AS ner_type,
           CAST(COUNT(*) AS INT) AS ent_len
    FROM nerg
    WHERE m = 1
    GROUP BY doc_id, sent_idx, run_id
)"""


def token_ner(
    spark: SparkSession, sf_dir: str, tok: DataFrame | None = None
) -> DataFrame:
    """W27 ``lookupNer`` as the J4 interval join: every token joined to
    the entity span covering it (``word_idx BETWEEN tok_begin AND
    tok_end``), yielding the reference's per-word BIO code (position 0
    -> ``<CLS>_B``, later -> ``<CLS>_I``, no span -> ``NONER``;
    ner.cxx:16-37).

    The join is equi on (doc_id, sent_idx) with the range predicate
    evaluated post-join — co-partitioned on the sentence key; span count
    per sentence is bounded, so no blowup at any corpus size.
    """
    if tok is None:
        tok = corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))
    tok = tok.select("doc_id", "sent_idx", "word_idx", "word")
    spans = synth_entity_spans(tok).select(
        F.col("doc_id").alias("s_doc"),
        F.col("sent_idx").alias("s_sent"),
        "tok_begin",
        "tok_end",
        "ner_type",
        "ent_len",
    )
    j = tok.join(
        spans,
        on=[
            tok["doc_id"] == spans["s_doc"],
            tok["sent_idx"] == spans["s_sent"],
            tok["word_idx"].between(spans["tok_begin"], spans["tok_end"]),
        ],
        how="left",
    ).select("doc_id", "sent_idx", "word_idx", "word", "ner_type", "tok_begin", "ent_len")
    bio = (
        F.when(F.col("ner_type").isNull(), "NONER")
        .when(F.col("word_idx") == F.col("tok_begin"), F.concat(F.col("ner_type"), F.lit("_B")))
        .otherwise(F.concat(F.col("ner_type"), F.lit("_I")))
    )
    return j.select(
        "doc_id",
        "sent_idx",
        "word_idx",
        "word",
        F.coalesce(F.col("ner_type"), F.lit("NONER")).alias("ner_class"),
        bio.alias("bio_tag"),
        F.coalesce(F.col("ent_len"), F.lit(0)).cast("int").alias("ent_len"),
    )


def _sql_token_ner() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_ENTITY_SPANS_CTE.strip()
        + """,
tokner AS (
    SELECT t.doc_id, t.sent_idx, t.word_idx, t.word,
           COALESCE(s.ner_type, 'NONER') AS ner_class,
           CASE WHEN s.ner_type IS NULL THEN 'NONER'
                WHEN t.word_idx = s.tok_begin THEN s.ner_type || '_B'
                ELSE s.ner_type || '_I' END AS bio_tag,
           CAST(COALESCE(s.ent_len, 0) AS INT) AS ent_len
    FROM tok t
    LEFT JOIN ner_spans s
      ON s.doc_id = t.doc_id AND s.sent_idx = t.sent_idx
     AND t.word_idx BETWEEN s.tok_begin AND s.tok_end
)"""
    )


def sql_token_ner() -> str:
    return _sql_token_ner() + "\nSELECT * FROM tokner"


def ner_features(
    spark: SparkSession, sf_dir: str, tok: DataFrame | None = None
) -> DataFrame:
    """Doc-grain NER battery: per-class token counts (the reference's
    sentence-grain counters summed to the document, docstats merge
    semantics), entity counts, mean entity length, and the W26
    personal-reference extension (PER tokens are person references —
    ``NER::toSem`` maps PER to SEM::HUMAN).
    """
    tn = token_ner(spark, sf_dir, tok=tok)
    per_cls = [
        F.sum(F.when(F.col("ner_class") == c, 1).otherwise(0))
        .cast("long")
        .alias(f"{c.lower()}_tok_cnt")
        for c in NER_CLASSES
    ]
    return tn.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("word_cnt"),
        *per_cls,
        F.sum(F.when(F.col("bio_tag").endswith("_B"), 1).otherwise(0))
        .cast("long")
        .alias("entity_cnt"),
        F.round(
            F.avg(F.when(F.col("bio_tag").endswith("_B"), F.col("ent_len"))), 6
        ).alias("avg_ent_len"),
        F.sum(F.when(F.col("ner_class") == "PER", 1).otherwise(0))
        .cast("long")
        .alias("pers_ref_ner_cnt"),
    )


def sql_ner_features() -> str:
    per_cls = ",\n           ".join(
        f"CAST(SUM(CASE WHEN ner_class = '{c}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {c.lower()}_tok_cnt"
        for c in NER_CLASSES
    )
    return (
        _sql_token_ner()
        + f"""
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS word_cnt,
       {per_cls},
       CAST(SUM(CASE WHEN bio_tag LIKE '%\\_B' ESCAPE '\\' THEN 1 ELSE 0 END) AS BIGINT)
           AS entity_cnt,
       ROUND(AVG(CASE WHEN bio_tag LIKE '%\\_B' ESCAPE '\\' THEN ent_len END), 6)
           AS avg_ent_len,
       CAST(SUM(CASE WHEN ner_class = 'PER' THEN 1 ELSE 0 END) AS BIGINT)
           AS pers_ref_ner_cnt
FROM tokner
GROUP BY doc_id"""
    )


# ---------------------------------------------------------------------------
# A11 np_length over NP chunk spans (FIXTURES.md §3 `chunks` table)
# ---------------------------------------------------------------------------


def synth_np_chunks(tok_tagged: DataFrame) -> DataFrame:
    """Deterministic NP-chunk sidecar: maximal runs of N/ADJ-tagged
    tokens, with the determiner = the token immediately preceding the
    run (mirrors FoLiA Chunk spans + ``cv[i]->index(0)``)."""
    w = Window.partitionBy("doc_id", "sent_idx").orderBy("word_idx")
    member = F.col("tag").isin(["N", "ADJ"])
    t = tok_tagged.withColumn("_m", member.cast("int"))
    t = t.withColumn("_prev_word", F.lag("word").over(w))
    t = t.withColumn(
        "_new", ((F.col("_m") == 1) & (F.coalesce(F.lag("_m").over(w), F.lit(0)) == 0)).cast("int")
    )
    t = t.withColumn("_run", F.sum("_new").over(w)).where(F.col("_m") == 1)
    return (
        t.groupBy("doc_id", "sent_idx", "_run")
        .agg(
            F.min("word_idx").alias("tok_begin"),
            F.max("word_idx").alias("tok_end"),
            F.count(F.lit(1)).cast("int").alias("np_len"),
            # det = prev token of the run's FIRST row; max-over-one-row
            # (only new_run=1 carries a value) is NULL-symmetric across
            # engines, unlike min_by (DuckDB MIN_BY skips NULL args,
            # Spark's keeps them)
            F.max(F.when(F.col("_new") == 1, F.col("_prev_word"))).alias("det_word"),
        )
        .select(
            "doc_id",
            "sent_idx",
            (F.col("_run") - 1).cast("int").alias("chunk_idx"),
            F.col("tok_begin").cast("int"),
            F.col("tok_end").cast("int"),
            "np_len",
            "det_word",
        )
    )


def np_chunk_features(
    spark: SparkSession, sf_dir: str, tok: DataFrame | None = None
) -> DataFrame:
    """A11 ``np_length`` (tscan.cxx:2105-2124) at sentence grain then
    doc grain: NP count, summed NP sizes, mean NP length, indefinite-NP
    count (determiner token == the indefinite article)."""
    if tok is None:
        tok = corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))
        tok = tok.withColumn("tag", annotate.tag_expr(F.col("word")))
    chunks = synth_np_chunks(tok)
    sent = chunks.groupBy("doc_id", "sent_idx").agg(
        F.count(F.lit(1)).alias("np_cnt"),
        F.sum("np_len").alias("np_size_sum"),
        F.sum(F.when(F.col("det_word") == INDEF_ARTICLE, 1).otherwise(0)).alias(
            "indef_np_cnt"
        ),
    )
    return sent.groupBy("doc_id").agg(
        F.sum("np_cnt").cast("long").alias("np_cnt"),
        F.sum("np_size_sum").cast("long").alias("np_size_sum"),
        F.sum("indef_np_cnt").cast("long").alias("indef_np_cnt"),
        F.round(F.sum("np_size_sum") / F.sum("np_cnt"), 6).alias("avg_np_len"),
    )


def sql_np_chunk_features() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + f""",
npt AS (
    SELECT tok.*,
           CASE WHEN {annotate.sql_tag("word")} IN ('N', 'ADJ') THEN 1 ELSE 0 END AS m
    FROM tok
),
npr AS (
    SELECT *,
           LAG(word) OVER (PARTITION BY doc_id, sent_idx ORDER BY word_idx)
               AS prev_word,
           CASE WHEN m = 1 AND COALESCE(LAG(m) OVER (
                    PARTITION BY doc_id, sent_idx ORDER BY word_idx), 0) = 0
                THEN 1 ELSE 0 END AS new_run
    FROM npt
),
npg AS (
    SELECT *,
           SUM(new_run) OVER (PARTITION BY doc_id, sent_idx
                              ORDER BY word_idx) AS run_id
    FROM npr
),
np_chunks AS (
    SELECT doc_id, sent_idx, run_id,
           COUNT(*) AS np_len,
           MAX(CASE WHEN new_run = 1 THEN prev_word END) AS det_word
    FROM npg
    WHERE m = 1
    GROUP BY doc_id, sent_idx, run_id
),
np_sent AS (
    SELECT doc_id, sent_idx,
           COUNT(*) AS np_cnt,
           SUM(np_len) AS np_size_sum,
           SUM(CASE WHEN det_word = '{INDEF_ARTICLE}' THEN 1 ELSE 0 END)
               AS indef_np_cnt
    FROM np_chunks
    GROUP BY doc_id, sent_idx
)
SELECT doc_id,
       CAST(SUM(np_cnt) AS BIGINT) AS np_cnt,
       CAST(SUM(np_size_sum) AS BIGINT) AS np_size_sum,
       CAST(SUM(indef_np_cnt) AS BIGINT) AS indef_np_cnt,
       ROUND(SUM(np_size_sum) * 1.0 / SUM(np_cnt), 6) AS avg_np_len
FROM np_sent
GROUP BY doc_id"""
    )
