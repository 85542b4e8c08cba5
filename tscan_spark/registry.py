"""Query registry: every implemented operator exposed as
(spark, sf_dir) -> DataFrame plus, where expressible, a DuckDB oracle SQL
string over the same parquet views. This is what __spark_entry__
re-exports to the driver."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import annotate, corpus, pipeline
from tscan_spark.operators import asof, overlap, temporal
from tscan_spark.session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


# ---------------------------------------------------------------------------
# T-Scan ladder (SURVEY.md §2.2, §2.5, §2.7)
# ---------------------------------------------------------------------------


@query(
    "tscan_word_features",
    oracle=(
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + annotate.sql_annot_cte().strip()
        + """
SELECT doc_id, par_idx, sent_idx, word_idx, word, l_word,
       CAST(char_cnt AS INT) AS char_cnt, tag, lemma,
       CAST(is_content AS INT) AS is_content, CAST(is_neg AS INT) AS is_neg,
       CAST(is_stop AS INT) AS is_stop, conn_type, sit_type
FROM annot"""
    ),
)
def q_word_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-W9, W18, W23 per-token classifier battery (broadcast lexicons)."""
    tok = annotate.annotate(corpus.tokens_long(corpus.load(spark, sf_dir, "documents")))
    return tok.select(
        "doc_id",
        "par_idx",
        "sent_idx",
        "word_idx",
        "word",
        "l_word",
        F.col("char_cnt").cast("int").alias("char_cnt"),
        "tag",
        "lemma",
        F.col("is_content").cast("int").alias("is_content"),
        F.col("is_neg").cast("int").alias("is_neg"),
        F.col("is_stop").cast("int").alias("is_stop"),
        "conn_type",
        "sit_type",
    )


@query(
    "tscan_sentence_features",
    oracle=pipeline.sql_sentence_features()
    + " SELECT * EXCLUDE (wfl_fp) FROM sentf",
)
def q_sentence_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 sentence fold: counter sums at (doc, par, sent) grain."""
    return pipeline.sentence_features(spark, sf_dir).drop("sent_wfl", "wfl_fp")


@query("tscan_doc_features", oracle=pipeline.sql_doc_features())
def q_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 document merge + A4 TTR + A6 rarity + D1/D2/D5 ratio select."""
    return pipeline.doc_features(spark, sf_dir)


@query(
    "docs_tokenized",
    oracle="""
WITH """
    + corpus.SQL_TOK_CTE.strip()
    + """,
v AS (
    SELECT word, CAST(DENSE_RANK() OVER (ORDER BY word) AS INT) AS token_id
    FROM (SELECT DISTINCT word FROM tok)
)
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       list(token_id ORDER BY word_idx) AS tokens,
       CAST(COUNT(*) AS INT) AS n_tok,
       source
FROM tok JOIN v USING (word)
GROUP BY doc_id, source""",
)
def q_docs_tokenized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BASELINE.json input_hint shape (exact token-array equality)."""
    return corpus.docs_tokenized(corpus.load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Window / lag operators (SURVEY.md §2.6)
# ---------------------------------------------------------------------------

_ANNOT_PRELUDE = (
    "WITH " + corpus.SQL_TOK_CTE.strip() + ",\n" + annotate.sql_annot_cte().strip()
)


@query(
    "sentence_overlap",
    oracle=_ANNOT_PRELUDE + overlap.SQL_SENTENCE_OVERLAP_TMPL,
)
def q_sentence_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 sentence->sentence argument overlap (lag-1 candidate buffers,
    paragraph reset, first sentence NA)."""
    return overlap.sentence_overlap(spark, sf_dir)


@query(
    "doc_sliding_overlap",
    oracle=_ANNOT_PRELUDE
    + overlap.SQL_DOC_SLIDING_OVERLAP_TMPL.format(n=overlap.OVERLAP_SIZE),
)
def q_doc_sliding_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 document sliding-buffer overlap (rowsBetween(-N, -1))."""
    return overlap.doc_sliding_overlap(spark, sf_dir)


# ---------------------------------------------------------------------------
# Event-time operators (north rule L4)
# ---------------------------------------------------------------------------


@query("sessionize_events", oracle=temporal.SQL_SESSIONIZE)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization per user (30-min gap)."""
    return temporal.sessionize(spark, sf_dir)


@query("backfill_events", oracle=temporal.SQL_BACKFILL)
def q_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill of error-event values (last non-null over time)."""
    return temporal.backfill(spark, sf_dir)


@query("lag_lead_events", oracle=temporal.SQL_LAG_LEAD)
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag/lead values + inter-event gap."""
    return temporal.lag_lead(spark, sf_dir)


# ---------------------------------------------------------------------------
# Point-in-time as-of lexicon join (SURVEY.md §2.4 J5, the north-rule core)
# ---------------------------------------------------------------------------


@query("asof_lexicon_features", oracle=asof.sql_asof_doc_features())
def q_asof_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc features against the latest lexicon snapshot <= event_ts
    (sorted-partition merge_asof kernel; zero temporal leakage)."""
    return asof.asof_doc_features(spark, sf_dir, strategy="merge")


@query("asof_lexicon_features_broadcast", oracle=asof.sql_asof_doc_features())
def q_asof_features_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics via the broadcast + max_by physical strategy."""
    return asof.asof_doc_features(spark, sf_dir, strategy="broadcast")


# ---------------------------------------------------------------------------
# Order-sensitive sequential kernels (SURVEY.md §2.3, A5)
# ---------------------------------------------------------------------------

from tscan_spark.operators import sequential  # noqa: E402


@query("multiword_matches", oracle=sequential.sql_multiword_matches())
def q_multiword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1-M7 greedy multi-word lexicon matching (longest match, consumed
    tokens skipped) as an applyInPandas kernel; oracle is a recursive
    CTE replaying the same scan."""
    return sequential.multiword_matches(spark, sf_dir)


@query("doc_mtld")  # order-sensitive fold: no SQL oracle (rows-only check)
def q_mtld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 MTLD (bidirectional, threshold 0.720) over 3 token streams."""
    return sequential.doc_mtld(spark, sf_dir)
