"""BPE tokenizer-training step (byte-pair-merge learning over the
corpus vocabulary).

A training-data pipeline owns its tokenizer; the expensive part of BPE
training is the corpus-weighted adjacent-pair count — which is exactly
a Spark aggregation.  This module implements one merge round:

- ``bpe_top_pairs``: explode every vocabulary word into its adjacent
  character pairs, weight each pair by the word's corpus frequency, and
  rank the top ``N_MERGES`` pairs (count DESC, pair ASC tie-break) —
  the merge-rule selection step of Sennrich et al. 2016.
- ``bpe_apply_merge``: apply the #1 merge to the space-separated symbol
  sequence of every word (left-to-right non-overlapping replace — the
  identical semantics in Spark's ``replace`` and DuckDB's) and report
  the symbol count before/after.

Full training iterates select→apply; each round is the same two jobs
over the current symbol-sequence column, so cost is rounds × one
aggregation — at corpus scale the pair counting runs over the
vocabulary dimension (tiny) weighted by corpus counts, never over the
token grain itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import corpus, lexicons

N_MERGES = 8


def _vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = corpus.load(spark, sf_dir, "documents")
    return lexicons.word_freq(docs).select("word", "wf_count")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent character-pair counts."""
    chars = vocab.select(
        "word",
        "wf_count",
        F.posexplode(F.split(F.col("word"), "")).alias("i", "c"),
    ).where(F.col("c") != "")
    w = Window.partitionBy("word").orderBy("i")
    pairs = chars.select(
        "word",
        "wf_count",
        F.col("c").alias("left_sym"),
        F.lead("c").over(w).alias("right_sym"),
    ).where(F.col("right_sym").isNotNull())
    return pairs.groupBy("left_sym", "right_sym").agg(
        F.sum("wf_count").cast("long").alias("pair_cnt")
    )


def bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N merge candidates.  Output: rank, left_sym, right_sym,
    pair_cnt."""
    counts = _pair_counts(_vocab(spark, sf_dir))
    # distributed top-k FIRST (TakeOrderedAndProject — per-partition
    # heaps, no global sort), THEN rank the surviving <= N_MERGES rows:
    # the unpartitioned row_number window runs over a constant-size
    # frame at any pair-vocabulary size (round-4 advice family — the
    # old shape ranked the whole pair vocabulary in one window task)
    top = counts.orderBy(
        F.desc("pair_cnt"), F.asc("left_sym"), F.asc("right_sym")
    ).limit(N_MERGES)
    w = Window.orderBy(
        F.desc("pair_cnt"), F.asc("left_sym"), F.asc("right_sym")
    )
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "left_sym",
        "right_sym",
        "pair_cnt",
    )


def bpe_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the #1 merge to every vocabulary word's symbol sequence.

    Output: word, wf_count, symbols_before, symbols_after, n_sym_before,
    n_sym_after.
    """
    vocab = _vocab(spark, sf_dir)
    top = bpe_top_pairs(spark, sf_dir).where(F.col("rank") == 1)
    seq = vocab.select(
        "word",
        "wf_count",
        F.concat_ws(
            " ", F.filter(F.split(F.col("word"), ""), lambda c: c != "")
        ).alias("symbols_before"),
    )
    j = seq.crossJoin(F.broadcast(top.select("left_sym", "right_sym")))
    after = F.replace(
        F.col("symbols_before"),
        F.concat(F.col("left_sym"), F.lit(" "), F.col("right_sym")),
        F.concat(F.col("left_sym"), F.col("right_sym")),
    )
    return j.select(
        "word",
        "wf_count",
        "symbols_before",
        after.alias("symbols_after"),
        (F.size(F.split(F.col("symbols_before"), " "))).cast("int").alias(
            "n_sym_before"
        ),
        (F.size(F.split(after, " "))).cast("int").alias("n_sym_after"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_SQL_PAIR_CTES = """
vocab AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS wf_count FROM tok GROUP BY word
),
chars AS (
    SELECT word, wf_count,
           CAST(generate_subscripts(string_split(word, ''), 1) AS INT) AS i,
           unnest(string_split(word, '')) AS c
    FROM vocab
),
adj AS (
    SELECT word, wf_count, c AS left_sym,
           lead(c) OVER (PARTITION BY word ORDER BY i) AS right_sym
    FROM chars
    WHERE c <> ''
),
pc AS (
    SELECT left_sym, right_sym, CAST(SUM(wf_count) AS BIGINT) AS pair_cnt
    FROM adj
    WHERE right_sym IS NOT NULL AND right_sym <> ''
    GROUP BY left_sym, right_sym
),
ranked AS (
    SELECT CAST(row_number() OVER (ORDER BY pair_cnt DESC, left_sym ASC,
                                   right_sym ASC) AS INT) AS rank,
           left_sym, right_sym, pair_cnt
    FROM pc
)"""


def sql_bpe_top_pairs() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + _SQL_PAIR_CTES.strip()
        + f"\nSELECT rank, left_sym, right_sym, pair_cnt FROM ranked"
        f"\nWHERE rank <= {N_MERGES}"
    )


def sql_bpe_apply_merge() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + _SQL_PAIR_CTES.strip()
        + """,
top1 AS (
    SELECT left_sym, right_sym FROM ranked WHERE rank = 1
),
seq AS (
    SELECT word, wf_count,
           array_to_string(list_filter(string_split(word, ''), c -> c <> ''),
                           ' ') AS symbols_before
    FROM vocab
)
SELECT s.word, s.wf_count, s.symbols_before,
       replace(s.symbols_before, t.left_sym || ' ' || t.right_sym,
               t.left_sym || t.right_sym) AS symbols_after,
       CAST(len(string_split(s.symbols_before, ' ')) AS INT) AS n_sym_before,
       CAST(len(string_split(replace(s.symbols_before,
                                     t.left_sym || ' ' || t.right_sym,
                                     t.left_sym || t.right_sym), ' ')) AS INT)
           AS n_sym_after
FROM seq s CROSS JOIN top1 t"""
    )


# ---------------------------------------------------------------------------
# Tokenizer apply: the full learned merge table, in rank order
# ---------------------------------------------------------------------------
#
# Real BPE tokenization replays the merge table in learned order; with
# character-pair rules each rule is one left-to-right non-overlapping
# replace over the space-separated symbol sequence (merged symbols no
# longer match later single-char patterns — exactly BPE's "new symbol"
# semantics).  The merge table is N_MERGES rows — pivoted to ONE row and
# broadcast, so application is a chained codegen expression over the
# vocabulary; corpus-grain tokenization broadcast-joins the result like
# every other lexicon dimension.  A rank that does not exist (tiny
# vocabularies) falls back to a sentinel pattern containing '~', which
# cannot occur in a symbol sequence.

_NO_MATCH = "~ ~"


def bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply all N_MERGES learned merges in rank order to every word.

    Output: word, wf_count, tokens (space-separated), n_tokens.
    """
    vocab = _vocab(spark, sf_dir)
    top = bpe_top_pairs(spark, sf_dir)
    wide = (
        top.groupBy()
        .pivot("rank", list(range(1, N_MERGES + 1)))
        .agg(F.first(F.concat("left_sym", F.lit(" "), "right_sym")))
    )
    seq0 = vocab.select(
        "word",
        "wf_count",
        F.concat_ws(
            " ", F.filter(F.split(F.col("word"), ""), lambda c: c != "")
        ).alias("seq"),
    )
    j = seq0.crossJoin(F.broadcast(wide))
    expr = F.col("seq")
    for k in range(1, N_MERGES + 1):
        pat = F.coalesce(F.col(f"`{k}`"), F.lit(_NO_MATCH))
        expr = F.replace(expr, pat, F.replace(pat, F.lit(" "), F.lit("")))
    return j.select(
        "word",
        "wf_count",
        expr.alias("tokens"),
        F.size(F.split(expr, " ")).cast("int").alias("n_tokens"),
    )


def sql_bpe_tokenize() -> str:
    reps = "s.seq"
    for k in range(1, N_MERGES + 1):
        pat = (
            f"coalesce((SELECT left_sym || ' ' || right_sym FROM ranked "
            f"WHERE rank = {k}), '{_NO_MATCH}')"
        )
        reps = f"replace({reps}, {pat}, replace({pat}, ' ', ''))"
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + _SQL_PAIR_CTES.strip()
        + f""",
seq AS (
    SELECT word, wf_count,
           array_to_string(list_filter(string_split(word, ''), c -> c <> ''),
                           ' ') AS seq
    FROM vocab
)
SELECT s.word, s.wf_count,
       {reps} AS tokens,
       CAST(len(string_split({reps}, ' ')) AS INT) AS n_tokens
FROM seq s"""
    )
