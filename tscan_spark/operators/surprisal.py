"""Surprisal / language-model aggregates (SURVEY.md §2.5 A10).

The reference receives per-word log-probabilities from the Wopr LM
service (``orderWopr``, /root/reference/src/tscan.cxx:1978-2064) — one
FORWARD and one BACKWARD stream (the reference runs Wopr twice, the
second pass over the reversed sentence) — and computes sentence-level
averages plus entropy/perplexity normalized by sentence length, then
paragraph/document values as **sums of sentence values divided by the
sentence count** (avg-of-avgs, src/structstats.cxx:984-1000).  The
document CSV carries each stream over four populations: all words,
content words (``_inhwrd``), without names (``_zn``), and content
without names (``_inhwrd_zn``) — src/structstats.cxx:976-979.

The engine consumes surprisal as an input column; the testdata ships
none, so both streams are synthesized deterministically from the
corpus-derived frequency lexicon:

- forward:  ``logprob10     = -freq_log/3.7 - (pos % 7)/19``
- backward: ``logprob10_bwd = -freq_log/3.7 - (bwd_pos % 7)/19`` where
  ``bwd_pos`` is the token's position from the sentence END — the same
  ladder fed by the reversed position stream, exactly the backward-LM
  input shape.

Population gates reuse the engine's established analogs: content =
CGN content tags (W23), name = HUMAN semantic class (the ISNAME
stand-in shared with mtld_names / the *_zn wordDifficulties arms).
All aggregates use the fixed-point (×1e6 BIGINT) ladder so Spark and
the DuckDB oracle are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import annotate, corpus, lexicons
from tscan_spark.functions.scalars import sql_freq_log

# The two LM streams: suffix -> position expression source.  Forward
# uses the token's sentence-internal position, backward its position
# from the sentence end (sentences are SENT_LEN-chunked, corpus.py).
STREAMS = ["", "_bwd"]
# gated populations: (suffix, needs_content, needs_no_name)
POPULATIONS = [("", False, False), ("_inh", True, False), ("_zn", False, True),
               ("_inh_zn", True, True)]


def _lp_expr(pos: Column) -> Column:
    # divisors chosen to avoid exact decimal ties at the 6th place
    # (x/4 of a 6dp value ends in ...25/...5/...75 -> round-tie cross-engine
    # disagreement); 3.7/19 produce generic doubles
    lp = -F.round(F.col("wf_freq_log"), 6) / 3.7 - (pos % 7) / 19.0
    return F.round(lp, 6)


def token_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token grain with logprob10 (fwd), logprob10_bwd and the
    population gate flags."""
    documents = corpus.load(spark, sf_dir, "documents")
    tok = annotate.annotate(corpus.tokens_long(documents))
    wf = lexicons.word_freq(documents)
    t = tok.join(F.broadcast(wf), "word")
    sent_pos = F.col("word_idx") % corpus.SENT_LEN
    bwd_pos = F.lit(corpus.SENT_LEN - 1) - sent_pos
    noun_sem = F.when(
        F.col("tag").isin(["N", "ADJ"]),
        F.coalesce(
            annotate.inflected_lookup(annotate.NOUN_SEM, F.col("lemma")),
            annotate.inflected_lookup(annotate.NOUN_SEM, F.col("word")),
        ),
    )
    return t.select(
        "*",
        _lp_expr(F.col("word_idx")).alias("logprob10"),
        _lp_expr(bwd_pos).alias("logprob10_bwd"),
        F.coalesce((noun_sem == "HUMAN").cast("int"), F.lit(0)).alias("is_name"),
    )


def _fp(col: str) -> Column:
    return F.round(F.col(col) * 1e6, 0).cast("long")


def _sentence_fold(t: DataFrame, keys: list[str]) -> DataFrame:
    """Per-sentence fixed-point sums/counts for every stream x population,
    then the sentence values (NULL when the population is empty)."""
    aggs = []
    for pop, need_c, need_zn in POPULATIONS:
        gate = F.lit(True)
        if need_c:
            gate = gate & (F.col("is_content") == 1)
        if need_zn:
            gate = gate & (F.col("is_name") == 0)
        aggs.append(F.sum(gate.cast("int")).alias(f"n{pop}"))
        for s in STREAMS:
            aggs.append(
                F.sum(F.when(gate, _fp(f"logprob10{s}")).otherwise(0)).alias(
                    f"lp{s}{pop}_fp"
                )
            )
    sent = t.groupBy(*keys).agg(*aggs)
    vals = [F.col(k) for k in keys]
    # no rounding on the divisions: lp_fp and n are exact integers, so
    # both engines compute bit-identical doubles
    for s in STREAMS:
        for pop, _, _ in POPULATIONS:
            vals.append(
                F.when(
                    F.col(f"n{pop}") > 0,
                    F.col(f"lp{s}{pop}_fp") / 1e6 / F.col(f"n{pop}"),
                ).alias(f"avg_lp10{s}{pop}")
            )
        # the reference's /len^2 normalization variant (entropy /
        # perplexity norms, src/tscan.cxx:2855-2864), all-words only
        vals.append(
            (F.col(f"lp{s}_fp") / 1e6 / (F.col("n") * F.col("n"))).alias(
                f"lp_norm_len2{s}"
            )
        )
    return sent.select(*vals)


_VALUE_COLS = [
    f"avg_lp10{s}{pop}" for s in STREAMS for pop, _, _ in POPULATIONS
] + [f"lp_norm_len2{s}" for s in STREAMS]


def _grain_fold(sent: DataFrame, keys: list[str]) -> DataFrame:
    """Avg-of-avgs over sentences, per value column; gated columns
    average over the sentences where the population is non-empty."""
    aggs = [F.count(F.lit(1)).cast("long").alias("sent_cnt")]
    for c in _VALUE_COLS:
        aggs.append(
            F.when(
                F.count(F.col(c)) > 0,
                F.sum(F.round(F.col(c) * 1e6, 0).cast("long"))
                / 1e6
                / F.count(F.col(c)),
            ).alias(c)
        )
    return sent.groupBy(*keys).agg(*aggs)


def surprisal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-grain Wopr vector: both streams x four populations + the
    len^2 norms (A10)."""
    t = token_surprisal(spark, sf_dir)
    sent = _sentence_fold(t, ["doc_id", "sent_idx"])
    return _grain_fold(sent, ["doc_id"])


def surprisal_paragraph_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 at PARAGRAPH grain: the reference's paragraph CSV carries the
    same Wopr cells as the document vector — sentence-value sums divided
    by the paragraph's sentence count (avg-of-avgs within the paragraph,
    structstats.cxx:984-1000 via parstats). Same fixed-point ladder,
    keyed by (doc_id, par_idx)."""
    t = token_surprisal(spark, sf_dir)
    sent = _sentence_fold(t, ["doc_id", "par_idx", "sent_idx"])
    return _grain_fold(sent, ["doc_id", "par_idx"])


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (rendered from the same constants)
# ---------------------------------------------------------------------------


def _sql_token_cte() -> str:
    noun_sem = (
        "CASE WHEN tag IN ('N', 'ADJ') THEN "
        f"COALESCE({annotate.sql_inflected_lookup(annotate.NOUN_SEM, 'lemma')}, "
        f"{annotate.sql_inflected_lookup(annotate.NOUN_SEM, 'word')}) END"
    )
    sent_pos = f"(word_idx % {corpus.SENT_LEN})"
    bwd_pos = f"({corpus.SENT_LEN - 1} - {sent_pos})"

    def lp(pos: str) -> str:
        return f"ROUND(-ROUND(wf_freq_log, 6) / 3.7 - ({pos} % 7) / 19.0, 6)"

    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + annotate.sql_annot_cte().strip()
        + f""",
wf AS (
    SELECT word,
           {sql_freq_log("COUNT(*)", "(SELECT COUNT(*) FROM tok)")} AS wf_freq_log
    FROM tok GROUP BY word
),
t AS (
    SELECT annot.*,
           {lp("word_idx")} AS logprob10,
           {lp(bwd_pos)} AS logprob10_bwd,
           CASE WHEN ({noun_sem}) = 'HUMAN' THEN 1 ELSE 0 END AS is_name
    FROM annot JOIN wf USING (word)
)"""
    )


def _sql_sent_cte(keys: str) -> str:
    sums = []
    for pop, need_c, need_zn in POPULATIONS:
        conds = []
        if need_c:
            conds.append("is_content = 1")
        if need_zn:
            conds.append("is_name = 0")
        gate = " AND ".join(conds) if conds else "TRUE"
        sums.append(f"SUM(CASE WHEN {gate} THEN 1 ELSE 0 END) AS n{pop}")
        for s in STREAMS:
            sums.append(
                f"SUM(CASE WHEN {gate} THEN CAST(ROUND(logprob10{s} * 1e6, 0) "
                f"AS BIGINT) ELSE 0 END) AS lp{s}{pop}_fp"
            )
    vals = []
    for s in STREAMS:
        for pop, _, _ in POPULATIONS:
            vals.append(
                f"CASE WHEN n{pop} > 0 THEN lp{s}{pop}_fp / 1e6 / n{pop} END "
                f"AS avg_lp10{s}{pop}"
            )
        vals.append(f"lp{s}_fp / 1e6 / (n * n) AS lp_norm_len2{s}")
    inner = ",\n           ".join(sums)
    outer = ",\n           ".join(vals)
    return f""",
sentg AS (
    SELECT {keys}, sent_idx,
           {inner}
    FROM t GROUP BY {keys}, sent_idx
),
sentv AS (
    SELECT {keys},
           {outer}
    FROM sentg
)"""


def _sql_grain_select(keys: str) -> str:
    vals = ",\n       ".join(
        f"CASE WHEN COUNT({c}) > 0 THEN "
        f"SUM(CAST(ROUND({c} * 1e6, 0) AS BIGINT)) / 1e6 / COUNT({c}) END AS {c}"
        for c in _VALUE_COLS
    )
    return f"""
SELECT {keys},
       CAST(COUNT(*) AS BIGINT) AS sent_cnt,
       {vals}
FROM sentv
GROUP BY {keys}"""


def sql_surprisal_features() -> str:
    return _sql_token_cte() + _sql_sent_cte("doc_id") + _sql_grain_select("doc_id")


def sql_surprisal_paragraph_features() -> str:
    return (
        _sql_token_cte()
        + _sql_sent_cte("doc_id, par_idx")
        + _sql_grain_select("doc_id, par_idx")
    )
