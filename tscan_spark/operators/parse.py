"""Parse-tree operators (SURVEY.md §2.8) over synthesized dependency
trees.

The reference computes its syntactic battery by XPath over per-sentence
Alpino trees (P1 dependency distances, Alpino.cxx:294-614; P2 D-level,
Alpino.cxx:728-954). The engine consumes *pre-parsed* node arrays
(SURVEY §1.3); the testdata ships none, so :func:`synth_parses` derives
a deterministic dependency tree per sentence (same single-source-of-
truth trick as the synthetic Frog): token i attaches to

    parent(i) = 0 if i == 0 else (i - 1 if i % 3 != 0 else i // 2)

giving chains with occasional long arcs — enough structure to exercise
both operators:

- :func:`dep_distance` — P1 analog: per-arc distance |i - parent(i)|,
  sentence grain mean + max, document grain = **mean of sentence means
  and mean of sentence maxima** (the A7 avg-of-avgs semantics,
  src/structstats.cxx:28-54 — NOT a flat mean; the flat mean is also
  emitted so the difference is visible/testable).
- :func:`tree_depth` — iterative parent-chain walk (depth of each node),
  a genuinely sequential tree traversal run as an Arrow kernel over
  sentence node arrays, with a recursive-CTE oracle. Stand-in for the
  D-level cascade's tree-walking shape (P2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import corpus
from tscan_spark.functions.scalars import sql_fp_sum

# parent rule constants (single source of truth; mirrored in SQL)
# parent(0) = 0 (root); i % 3 != 0 -> i - 1 (chain); else i // 2 (arc)


def _with_parent(tok: DataFrame) -> DataFrame:
    i = F.col("tok_i")
    parent = F.when(i == 0, 0).when(i % 3 != 0, i - 1).otherwise(F.floor(i / 2)).cast(
        "int"
    )
    return tok.withColumn("parent", parent)


def _sent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))
    # token index within the sentence
    return tok.withColumn(
        "tok_i", (F.col("word_idx") % corpus.SENT_LEN).cast("int")
    )


SQL_SENT_TOK_CTE = f"""
stok AS (
    SELECT tok.*,
           CAST(word_idx % {corpus.SENT_LEN} AS INT) AS tok_i,
           CAST(CASE WHEN word_idx % {corpus.SENT_LEN} = 0 THEN 0
                     WHEN (word_idx % {corpus.SENT_LEN}) % 3 <> 0
                          THEN word_idx % {corpus.SENT_LEN} - 1
                     ELSE (word_idx % {corpus.SENT_LEN}) // 2 END AS INT) AS parent
    FROM tok
)"""


def dep_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/A7: dependency distances with doc-grain avg-of-avgs semantics.

    Per arc: dist = |tok_i - parent| (root arc excluded). Sentence grain
    mean/max; doc grain = mean of sentence means (al_gem analog), mean
    of sentence maxima (al_max analog), plus the flat token-grain mean
    (al_gem_flat) to pin the avg-of-avgs distinction.
    """
    tok = _with_parent(_sent_tokens(spark, sf_dir)).where(F.col("tok_i") > 0)
    dist = F.abs(F.col("tok_i") - F.col("parent"))
    sent = tok.groupBy("doc_id", "sent_idx").agg(
        F.round(F.avg(dist), 6).alias("sent_mean"),
        F.max(dist).alias("sent_max"),
        F.count(F.lit(1)).alias("n_arcs"),
        F.sum(dist).alias("sum_dist"),
    )
    doc = sent.groupBy("doc_id").agg(
        # avg-of-avgs: fixed-point over the rounded sentence means
        F.round(
            F.sum(F.round(F.col("sent_mean") * 1e6, 0).cast("long"))
            / 1e6
            / F.count(F.lit(1)),
            6,
        ).alias("al_gem"),
        F.round(F.avg(F.col("sent_max").cast("double")), 6).alias("al_max"),
        F.round(F.sum("sum_dist") / F.sum("n_arcs"), 6).alias("al_gem_flat"),
        F.count(F.lit(1)).alias("sent_cnt"),
    )
    return doc.withColumn("sent_cnt", F.col("sent_cnt").cast("long"))


def sql_dep_distance() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SENT_TOK_CTE.strip()
        + """,
arcs AS (
    SELECT doc_id, sent_idx, ABS(tok_i - parent) AS dist
    FROM stok WHERE tok_i > 0
),
sentd AS (
    SELECT doc_id, sent_idx,
           ROUND(AVG(dist), 6) AS sent_mean,
           MAX(dist) AS sent_max,
           COUNT(*) AS n_arcs,
           SUM(dist) AS sum_dist
    FROM arcs GROUP BY doc_id, sent_idx
)
SELECT doc_id,
       ROUND(SUM(CAST(ROUND(sent_mean * 1e6, 0) AS BIGINT)) / 1e6 / COUNT(*), 6)
           AS al_gem,
       ROUND(AVG(CAST(sent_max AS DOUBLE)), 6) AS al_max,
       ROUND(SUM(sum_dist) * 1.0 / SUM(n_arcs), 6) AS al_gem_flat,
       CAST(COUNT(*) AS BIGINT) AS sent_cnt
FROM sentd
GROUP BY doc_id"""
    )


def tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative parent-chain depth per node -> sentence depth stats.

    The depth walk (follow parent links to the root) is inherently
    sequential per node — the tree-walk kernel shape of the reference's
    parse batteries — run as mapInPandas over sentence node arrays.
    Output: (doc_id, sent_idx, max_depth, sum_depth).
    """
    tok = _with_parent(_sent_tokens(spark, sf_dir))
    grouped = tok.groupBy("doc_id", "sent_idx").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("tok_i", F.col("parent").alias("p")))),
            lambda s: s["p"],
        ).alias("parents")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            max_d, sum_d = [], []
            for parents in pdf["parents"]:
                parents = list(parents)
                depths = [0] * len(parents)
                for i in range(1, len(parents)):
                    # parent(i) < i always, so one pass suffices
                    depths[i] = depths[parents[i]] + 1
                max_d.append(max(depths) if depths else 0)
                sum_d.append(sum(depths))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sent_idx": pdf["sent_idx"],
                    "max_depth": max_d,
                    "sum_depth": sum_d,
                }
            )

    return grouped.mapInPandas(
        kernel, schema="doc_id long, sent_idx int, max_depth int, sum_depth long"
    )


def sql_tree_depth() -> str:
    """Recursive-CTE oracle: walk each node's parent chain to the root."""
    return (
        "WITH RECURSIVE "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SENT_TOK_CTE.strip()
        + """,
walk (doc_id, sent_idx, node, cur, depth) AS (
    SELECT doc_id, sent_idx, tok_i, tok_i, 0 FROM stok
    UNION ALL
    SELECT w.doc_id, w.sent_idx, w.node, s.parent, w.depth + 1
    FROM walk w
    JOIN stok s ON s.doc_id = w.doc_id AND s.sent_idx = w.sent_idx
               AND s.tok_i = w.cur
    WHERE w.cur > 0
),
depths AS (
    SELECT doc_id, sent_idx, node, MAX(depth) AS depth
    FROM walk GROUP BY doc_id, sent_idx, node
)
SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx,
       CAST(MAX(depth) AS INT) AS max_depth,
       CAST(SUM(depth) AS BIGINT) AS sum_depth
FROM depths
GROUP BY doc_id, sent_idx"""
    )
