"""Corpus-trained bigram language model (SURVEY.md §2.1 S4, §2.5 A10).

The reference streams every sentence through the Wopr n-gram LM service
and consumes per-token log-probabilities (``orderWopr``,
/root/reference/src/tscan.cxx:1978-2064).  Wopr itself is an external
trained model; the engine's full analog is to TRAIN the model as a
Spark job and score the corpus with it — not to synthesize a logprob
column (that synthetic ladder remains in ``operators/surprisal.py`` as
the "annotations consumed as input" path; this module is the trained-
source path that closes S4).

Model: sentence-internal bigram LM with add-one (Laplace) smoothing and
an explicit BOS context::

    prev(w_i)   = w_{i-1} within the sentence, else BOS
    p(w | prev) = (c(prev, w) + 1) / (c(prev, ·) + V)

where ``V`` is the corpus vocabulary size and ``c(BOS, ·)`` is the
sentence count.  Everything is counting + one join, so the DuckDB
oracle replays it exactly; per-token ``logprob10 = round(log10(p), 6)``
and document aggregates use the engine's fixed-point (×1e6 BIGINT)
ladder so both engines sum identical integers.

Physical plan (and why it scales):

- the lag window is partitioned by (doc_id, sent_idx) — a per-document
  local sort after one shuffle on doc_id; no global ordering anywhere.
- bigram counts are one hash aggregate on (prev, word); the context
  totals derive from that aggregate (model-sized, not corpus-sized).
- scoring joins the token grain to the bigram table on (prev, word) —
  a shuffle hash join keyed on the bigram, linear in corpus size; the
  context table and the V/S scalars broadcast.
- at 100 TB the bigram table is itself large: the join stays the same
  shape (AQE picks SHJ/SMJ), and the model would be persisted once as
  a snapshot table (operators/asof.py pattern) instead of recounted.

Perplexity bucketing (``lm_perplexity_buckets``) is the CCNet-style
head/middle/tail split: documents ranked per source by mean logprob and
cut into terciles arithmetically (``floor((r-1)*3/cnt)``), which both
engines compute identically.  The registered query uses an exact
per-source rank (one window sort per source); at corpus scale the
production variant replaces the sort with approx-quantile cutpoints
computed on the doc-grain aggregate (percentile_approx → broadcast two
thresholds → per-row comparison) — same buckets up to quantile
tolerance, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import corpus

BOS = "<s>"  # synthetic corpus words are alphanumeric; '<s>' cannot collide
N_BUCKETS = 3
BUCKET_NAMES = ["head", "middle", "tail"]


def _fp(col: Column) -> Column:
    return F.round(col * 1e6, 0).cast("long")


def token_logprobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token grain scored by the corpus-trained bigram LM.

    Columns: doc_id, source, word_idx, word, prev, cb (bigram count),
    ctx (context total), logprob10.
    """
    tok = corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))
    w = Window.partitionBy("doc_id", "sent_idx").orderBy("word_idx")
    t = tok.select(
        "doc_id",
        "source",
        "word_idx",
        "word",
        F.coalesce(F.lag("word").over(w), F.lit(BOS)).alias("prev"),
    )
    big = t.groupBy("prev", "word").agg(F.count(F.lit(1)).alias("cb"))
    ctx = big.groupBy("prev").agg(F.sum("cb").alias("ctx"))
    vsize = (
        tok.agg(F.countDistinct("word").cast("long").alias("vsize"))
    )
    scored = (
        t.join(big, ["prev", "word"])
        .join(F.broadcast(ctx), "prev")
        .crossJoin(F.broadcast(vsize))
    )
    p = (F.col("cb") + F.lit(1.0)) / (F.col("ctx") + F.col("vsize"))
    return scored.select(
        "doc_id",
        "source",
        "word_idx",
        "word",
        "prev",
        "cb",
        "ctx",
        F.round(F.log10(p), 6).alias("logprob10"),
    )


def _doc_agg(t: DataFrame) -> DataFrame:
    """Doc-grain fixed-point fold: n_tok, mean logprob10, perplexity."""
    agg = t.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.sum(_fp(F.col("logprob10"))).alias("lp_fp"),
    )
    mean_lp = F.round(F.col("lp_fp") / 1e6 / F.col("n_tok"), 6)
    return agg.select(
        "doc_id",
        "source",
        "n_tok",
        "lp_fp",
        mean_lp.alias("mean_logprob10"),
        F.round(F.pow(F.lit(10.0), -mean_lp), 4).alias("ppl"),
    )


def lm_bigram_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document aggregates under the trained bigram LM.

    Output: doc_id, source, n_tok, mean_logprob10, ppl.
    """
    return _doc_agg(token_logprobs(spark, sf_dir)).drop("lp_fp")


def lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-source perplexity terciles over the doc grain.

    Output: doc_id, source, mean_logprob10, ppl, bucket — 'head' is the
    lowest-perplexity (most in-domain) tercile.  Ordering key is the
    exact fixed-point mean (BIGINT), so ranks are reproducible.
    """
    d = _doc_agg(token_logprobs(spark, sf_dir))
    mean_fp = F.round(F.col("lp_fp") * 1.0 / F.col("n_tok"), 0).cast("long")
    d = d.withColumn("mean_fp", mean_fp)
    w = Window.partitionBy("source").orderBy(F.desc("mean_fp"), F.asc("doc_id"))
    cnt = Window.partitionBy("source")
    r = F.row_number().over(w)
    idx = F.least(
        F.lit(N_BUCKETS - 1),
        F.floor((r - 1) * N_BUCKETS / F.count(F.lit(1)).over(cnt)),
    ).cast("int")
    names = F.array(*[F.lit(b) for b in BUCKET_NAMES])
    return d.select(
        "doc_id",
        "source",
        "mean_logprob10",
        "ppl",
        F.element_at(names, idx + 1).alias("bucket"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_SQL_SCORED_CTES = """
prevd AS (
    SELECT doc_id, source, word_idx, word,
           coalesce(lag(word) OVER (PARTITION BY doc_id, sent_idx
                                    ORDER BY word_idx), '{bos}') AS prev
    FROM tok
),
big AS (
    SELECT prev, word, COUNT(*) AS cb FROM prevd GROUP BY prev, word
),
ctx AS (
    SELECT prev, SUM(cb) AS ctx FROM big GROUP BY prev
),
v AS (
    SELECT COUNT(DISTINCT word) AS vsize FROM tok
),
scored AS (
    SELECT p.doc_id, p.source, p.word_idx, p.word, p.prev, b.cb, c.ctx,
           round(log10((b.cb + 1.0) / (c.ctx + v.vsize)), 6) AS logprob10
    FROM prevd p
    JOIN big b ON b.prev = p.prev AND b.word = p.word
    JOIN ctx c ON c.prev = p.prev
    CROSS JOIN v
),
docagg AS (
    SELECT doc_id, source,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           SUM(CAST(round(logprob10 * 1e6, 0) AS BIGINT)) AS lp_fp
    FROM scored
    GROUP BY doc_id, source
),
docvals AS (
    SELECT doc_id, source, n_tok, lp_fp,
           round(lp_fp / 1e6 / n_tok, 6) AS mean_logprob10,
           round(pow(10.0, -round(lp_fp / 1e6 / n_tok, 6)), 4) AS ppl
    FROM docagg
)""".format(bos=BOS)


def sql_lm_bigram_doc() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + _SQL_SCORED_CTES.strip()
        + "\nSELECT doc_id, source, n_tok, mean_logprob10, ppl FROM docvals"
    )


def sql_lm_perplexity_buckets() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + _SQL_SCORED_CTES.strip()
        + """,
ranked AS (
    SELECT doc_id, source, mean_logprob10, ppl,
           CAST(round(lp_fp * 1.0 / n_tok, 0) AS BIGINT) AS mean_fp
    FROM docvals
),
bucketed AS (
    SELECT doc_id, source, mean_logprob10, ppl,
           CAST(least({k} - 1,
                (row_number() OVER (PARTITION BY source
                                    ORDER BY mean_fp DESC, doc_id) - 1)
                * {k} // (COUNT(*) OVER (PARTITION BY source)))
               AS INT) AS bidx
    FROM ranked
)
SELECT doc_id, source, mean_logprob10, ppl,
       ['head', 'middle', 'tail'][bidx + 1] AS bucket
FROM bucketed""".format(k=N_BUCKETS)
    )
