"""Collocation mining: pointwise mutual information over bigrams.

The classic corpus-analysis companion to the frequency ladder (the
reference scores words against static frequency lexicons,
tscan.cxx:462-471; PMI scores PAIRS against the corpus's own unigram
model).  In a training-data pipeline PMI collocations drive tokenizer
merge auditing (cf. bpe_top_pairs — count-ranked vs association-ranked
pairs), boilerplate detection (template corpora show pathological PMI
tails) and phrase-aware dedup keys.

PMI(x, y) = ln( p(x,y) / (p(x) p(y)) ) with p(x,y) = c_xy / N2,
p(x) = c_x / N1 (N1 = tokens, N2 = bigram slots).  A MIN_PAIR_COUNT
gate keeps the estimate stable (PMI of a count-1 pair is noise).

Plan shape:

- ONE token-grain pass for unigram counts, one doc-bounded lead()
  window for the bigram grain (same shape as the Gopher gates —
  no cross-doc shuffle), one (word_a, word_b) hash aggregate.
- Unigram counts live at vocabulary grain — broadcast twice into the
  pair scoring (left word, right word); totals ride a 1-row cross
  join.
- Output is every gated pair (no top-k): ordering by a float PMI
  would make rank assignment depend on cross-engine ULP differences
  in ln(); consumers sort client-side, and the driver's value
  comparison is order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tscan_spark import corpus

MIN_PAIR_COUNT = 5


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = corpus.load(spark, sf_dir, "documents")
    tok = corpus.tokens_long(docs).select("doc_id", "word_idx", "word")
    uni = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c_w"))
    n1 = uni.agg(F.sum("c_w").alias("n1"))

    w = Window.partitionBy("doc_id").orderBy("word_idx")
    pairs = (
        tok.withColumn("word_b", F.lead("word").over(w))
        .where(F.col("word_b").isNotNull())
        .groupBy(F.col("word").alias("word_a"), "word_b")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    n2 = pairs.agg(F.sum("c_xy").alias("n2"))

    ua = uni.select(F.col("word").alias("word_a"), F.col("c_w").alias("c_a"))
    ub = uni.select(F.col("word").alias("word_b"), F.col("c_w").alias("c_b"))
    scored = (
        pairs.where(F.col("c_xy") >= MIN_PAIR_COUNT)
        .join(F.broadcast(ua), "word_a")
        .join(F.broadcast(ub), "word_b")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
    )
    pmi = F.log(
        (F.col("c_xy") / F.col("n2"))
        / ((F.col("c_a") / F.col("n1")) * (F.col("c_b") / F.col("n1")))
    )
    return scored.select(
        "word_a",
        "word_b",
        F.col("c_xy").cast("long").alias("c_xy"),
        F.round(pmi, 6).alias("pmi"),
    ).orderBy("word_a", "word_b")


SQL_PMI_COLLOCATIONS = f"""
WITH {corpus.SQL_TOK_CTE},
uni AS (SELECT word, COUNT(*) AS c_w FROM tok GROUP BY 1),
n1 AS (SELECT SUM(c_w) AS n1 FROM uni),
big AS (
    SELECT doc_id, word AS word_a,
           lead(word) OVER (PARTITION BY doc_id ORDER BY word_idx) AS word_b
    FROM tok
),
pairs AS (
    SELECT word_a, word_b, COUNT(*) AS c_xy
    FROM big WHERE word_b IS NOT NULL
    GROUP BY 1, 2
),
n2 AS (SELECT SUM(c_xy) AS n2 FROM pairs)
SELECT p.word_a, p.word_b,
       CAST(p.c_xy AS BIGINT) AS c_xy,
       ROUND(ln((p.c_xy * 1.0 / n2.n2)
                / ((ua.c_w * 1.0 / n1.n1) * (ub.c_w * 1.0 / n1.n1))), 6) AS pmi
FROM pairs p
JOIN uni ua ON ua.word = p.word_a
JOIN uni ub ON ub.word = p.word_b
CROSS JOIN n1 CROSS JOIN n2
WHERE p.c_xy >= {MIN_PAIR_COUNT}
ORDER BY p.word_a, p.word_b
"""
