"""Explicit skew handling: salted two-stage aggregation and salted joins.

The north rule requires partitioning/shuffle/skew handled explicitly for
long-token-array documents. Three mechanisms, composable:

1. AQE skew-join splitting (enabled in session.tune()) — runtime fix for
   joins, free.
2. :func:`salted_count` — two-stage aggregation: stage 1 aggregates on
   (key, salt) so one hot key spreads over SALT_K reducers, stage 2
   merges the partials. Use for token-grain groupBys when a single
   doc_id/word can exceed a reducer (e.g. word frequencies under a
   Zipfian head at 10^12 tokens — 'the' alone would hot-spot one task).
3. :func:`repartition_range_docs` — repartitionByRange on doc_id before
   per-doc windows, so document order locality is preserved and huge
   docs spread across range bounds rather than hashing to one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_K = 16


def salted_count(df: DataFrame, key_cols: list[str], salt_k: int = SALT_K) -> DataFrame:
    """Exact count per key via salted two-stage aggregation.

    Equivalent to ``df.groupBy(*key_cols).count()`` but the first stage
    spreads each key over ``salt_k`` partial groups (salt = spark hash of
    the whole row modulo k — uniform, deterministic per row content).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_k))
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(*key_cols).agg(F.sum("_pc").cast("long").alias("cnt"))


def salted_sum(
    df: DataFrame, key_cols: list[str], value_col: str, salt_k: int = SALT_K
) -> DataFrame:
    """Exact long-sum per key, salted (value_col must be integral —
    fixed-point upstream keeps double sums exact, see functions.scalars)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_k))
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(F.sum(value_col).alias("_ps"))
    return partial.groupBy(*key_cols).agg(F.sum("_ps").cast("long").alias(value_col))


def repartition_range_docs(df: DataFrame, n: int | None = None) -> DataFrame:
    """Range-partition by (doc_id, word_idx) ahead of per-doc sequential
    kernels: keeps each doc contiguous and sorted, which is what
    applyInPandas folds and merge_asof need."""
    cols = [F.col("doc_id")]
    if "word_idx" in df.columns:
        cols.append(F.col("word_idx"))
    return df.repartitionByRange(*([n] if n else []), *cols)


def salted_word_counts(spark, sf_dir: str) -> DataFrame:
    """Registered witness for the salted two-stage aggregation: exact
    per-word corpus counts computed through the skew path (identical
    results to a plain groupBy — that's the oracle)."""
    from tscan_spark import corpus

    tok = corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))
    return salted_count(tok.select("word"), ["word"])


def sql_salted_word_counts() -> str:
    from tscan_spark import corpus

    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + """
SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY word"""
    )
