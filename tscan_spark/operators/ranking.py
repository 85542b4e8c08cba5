"""BM25 relevance ranking over the tokenized corpus.

The reference ranks words against frequency lexicons (freqLog bands,
tscan.cxx:462-471) but has no document-relevance scorer; a training-data
pipeline needs one (quality-weighted retrieval, dedup tie-breaking,
contamination triage).  This is Robertson/Sparck-Jones BM25 (k1=1.2,
b=0.75) with the query itself derived from the corpus — the top-3 global
tokens — so the registered query is fully self-contained and the DuckDB
oracle replays every step including query-term selection.

Plan shape (the part that matters at 100 TB):

- ONE corpus-sized aggregate: token grain -> tf(doc_id, word).  Every
  other frame is a reduction of tf: dl = sum(tf) per doc (doc grain),
  df and global counts per word (vocabulary grain), corpus totals
  (1 row).  The raw token grain is never re-scanned.
- Query-term selection is a vocabulary-grain top-k (ORDER BY ... LIMIT
  pushes a per-partition TakeOrdered, no global sort of the vocab).
- Scoring FILTERS FIRST: tf semi-joins the 3-row broadcast query
  dimension before touching doc lengths, so the dl join runs over
  |docs containing a query term| rows, not the full tf.  The totals
  frame is a 1-row broadcast cross join.
- All constants are explicit DOUBLE on both engines (DuckDB parses bare
  `1.2` as DECIMAL, whose arithmetic rounds differently — every literal
  in the oracle is ::DOUBLE).

Output: (doc_id, n_hits, bm25) for every document containing at least
one query term, bm25 rounded to 9 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import corpus
from tscan_spark.cache import with_cache as _with_cache

BM25_K1 = 1.2
BM25_B = 0.75
N_QUERY_TERMS = 3


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = corpus.load(spark, sf_dir, "documents")
    tok = corpus.tokens_long(docs).select("doc_id", "word")

    # every downstream frame (dl, df, query terms, totals, scoring) is
    # a reduction of tf — persist it under the cache contract so the
    # corpus is scanned ONCE (without it the plan rescans documents
    # ~5x, once per branch; at 100 TB this persist is the staging-table
    # materialization, cache.py module docstring)
    tf = (
        tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf")).persist()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    tot = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    by_word = tf.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cnt")
    )
    qterms = by_word.orderBy(F.desc("cnt"), "word").limit(N_QUERY_TERMS)
    qdim = qterms.crossJoin(F.broadcast(tot)).select(
        "word",
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ).alias("idf"),
    )

    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    hits = tf.join(F.broadcast(qdim), "word").join(dl, "doc_id").crossJoin(
        F.broadcast(tot)
    )
    term_score = F.col("idf") * (
        F.col("tf") * (k1 + F.lit(1.0))
        / (
            F.col("tf")
            + k1 * (F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    # per-term fixed-point encode BEFORE the sum so the per-doc
    # reduction is an exact integer add — reduction-order-free across
    # shuffles and engines (round-4 advice; same convention as the
    # similarity/drift families)
    term_fp = F.round(term_score * F.lit(1e9), 0).cast("long")
    out = (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_hits"),
            F.round(F.sum(term_fp) / F.lit(1e9), 9).alias("bm25"),
        )
        .orderBy("doc_id")
    )
    return _with_cache(out, tf)


SQL_BM25_SCORES = f"""
WITH {corpus.SQL_TOK_CTE},
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
tot AS (
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl
),
by_word AS (
    SELECT word, COUNT(*) AS df, SUM(tf) AS cnt FROM tf GROUP BY 1
),
q AS (SELECT word, df FROM by_word ORDER BY cnt DESC, word LIMIT {N_QUERY_TERMS}),
qd AS (
    SELECT word,
           ln((n_docs - df + CAST(0.5 AS DOUBLE))
              / (df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) AS idf
    FROM q CROSS JOIN tot
)
SELECT tf.doc_id,
       CAST(COUNT(*) AS INT) AS n_hits,
       ROUND(SUM(CAST(ROUND(
           qd.idf * (tf.tf * (CAST({BM25_K1} AS DOUBLE) + CAST(1.0 AS DOUBLE))
                 / (tf.tf + CAST({BM25_K1} AS DOUBLE)
                    * (CAST(1.0 AS DOUBLE) - CAST({BM25_B} AS DOUBLE)
                       + CAST({BM25_B} AS DOUBLE) * dl.dl / tot.avgdl)))
           * 1e9) AS BIGINT)) / 1e9, 9) AS bm25
FROM tf
JOIN qd USING (word)
JOIN dl USING (doc_id)
CROSS JOIN tot
GROUP BY tf.doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (per-document top-k)
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 3


def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k keywords per document by TF-IDF.

    Complements :func:`bm25_scores` (query -> docs) with the inverse
    direction (doc -> terms): the reference ranks words only against
    static frequency lexicons (freqLog bands, tscan.cxx:462-471); a
    training-data pipeline wants per-document salient terms for topic
    tagging, near-dup triage and index keys.

    Plan shape:

    - the same single token-grain aggregate as BM25 (tf), persisted
      under the cache contract for its two consumers (df counts and
      scoring);
    - df/idf live at VOCABULARY grain (tiny, broadcast into the
      scoring join);
    - the top-k is a window partitioned BY doc_id — hash-partitioned,
      no global sort, scales with documents.

    The rank ordering is the ACTUAL tf*idf score, made
    integer-deterministic by fixed-point encoding:
    ``CAST(ROUND(tf * ln(n_docs/df) * 1e9) AS BIGINT) DESC, word ASC``
    with the identical expression on both engines.  (An earlier version
    ordered by (tf DESC, df ASC) claiming it agreed with the float
    order — false in general: product order != lexicographic order, so
    a term present in every doc (idf = 0) with high tf outranked rare
    high-tfidf terms.  Round-4 advice; fixed round 5 with a true-top-k
    semantics check in tests/test_operators.py::
    test_tfidf_keywords_semantics.)  Ordering by
    the raw double would make ranks depend on cross-engine ULP
    differences in ln(); the 1e-9 grid is far coarser than the ~1e-15
    relative ULP error, so both engines land on the same integer.
    """
    docs = corpus.load(spark, sf_dir, "documents")
    tok = corpus.tokens_long(docs).select("doc_id", "word")
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf")).persist()
    tot = tf.select("doc_id").distinct().agg(F.count(F.lit(1)).alias("n_docs"))
    by_word = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(by_word.crossJoin(F.broadcast(tot))), "word")
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
        )
    )
    from pyspark.sql.window import Window

    scored = scored.withColumn(
        "score_fp", F.round(F.col("tfidf") * F.lit(1e9), 0).cast("long")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_fp"), F.asc("word"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            "word",
            F.col("tf").cast("int").alias("tf"),
            F.round("tfidf", 9).alias("tfidf"),
        )
        .orderBy("doc_id", "rank")
    )
    return _with_cache(out, tf)


SQL_TFIDF_KEYWORDS = f"""
WITH {{tok_cte}},
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
tot AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
by_word AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
    SELECT tf.doc_id, tf.word, tf.tf, by_word.df,
           tf.tf * ln(CAST(tot.n_docs AS DOUBLE) / CAST(by_word.df AS DOUBLE))
               AS tfidf,
           ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(ROUND(
                   tf.tf * ln(CAST(tot.n_docs AS DOUBLE)
                              / CAST(by_word.df AS DOUBLE)) * 1e9
               ) AS BIGINT) DESC, tf.word ASC
           ) AS rank
    FROM tf JOIN by_word USING (word) CROSS JOIN tot
)
SELECT doc_id, CAST(rank AS INT) AS rank, word,
       CAST(tf AS INT) AS tf, ROUND(tfidf, 9) AS tfidf
FROM scored
WHERE rank <= {TFIDF_TOP_K}
ORDER BY doc_id, rank
"""
SQL_TFIDF_KEYWORDS = SQL_TFIDF_KEYWORDS.format(tok_cte=corpus.SQL_TOK_CTE)
