"""The tokenization contract: documents -> token grain -> docs table.

The reference consumes a FoLiA document tree (doc -> paragraph ->
sentence -> word, /root/reference/include/tscan/stats.h:107) produced by
the Frog tokenizer.  The engine's canonical input (BASELINE.json
``input_hint``) is the flat pre-tokenized table::

    docs(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)

This module derives that shape *deterministically* from the synthetic
``documents`` parquet (whitespace tokenization, dense-rank vocabulary,
fixed-size sentence/paragraph chunking, event timestamps derived from
``doc_id``).  Every rule here is intentionally expressible in plain ANSI
SQL so the DuckDB oracle can replicate it exactly.

Contract (shared with every ``oracle_sql`` entry):

- token     = ``split(text, ' ')`` elements, empty strings dropped
- word_idx  = 0-based position within the document
- sent_idx  = word_idx // 10          (fixed sentence length)
- par_idx   = sent_idx // 4           (fixed paragraph length)
- token_id  = dense_rank of the word over the corpus vocabulary (1-based)
- event_ts  = DATE '2024-01-01' + (doc_id % 90) days
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SENT_LEN = 10  # tokens per synthetic sentence
PAR_LEN = 4  # sentences per synthetic paragraph

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst prunes columns/pushes filters."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tokens_long(documents: DataFrame) -> DataFrame:
    """Explode documents to token grain with tree coordinates.

    Spark mapping of the FoLiA word nodes (SURVEY.md §1.3): one row per
    token with (doc_id, par_idx, sent_idx, word_idx, word).  This is a
    pure narrow map — no shuffle; the explode multiplies rows ~50x but
    stays within the same partitions, so it scales linearly with input
    splits at any corpus size.
    """
    tok = documents.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.col("text"), " ")).alias("word_idx", "word"),
    ).where(F.col("word") != "")
    return tok.select(
        "doc_id",
        "source",
        F.col("word_idx").cast("int").alias("word_idx"),
        F.floor(F.col("word_idx") / SENT_LEN).cast("int").alias("sent_idx"),
        F.floor(F.col("word_idx") / (SENT_LEN * PAR_LEN)).cast("int").alias("par_idx"),
        "word",
    )


def vocab(documents: DataFrame) -> DataFrame:
    """Corpus vocabulary with dense-rank token ids (deterministic).

    Mirrors the reference's lexicon keying by surface word; tiny by
    construction (vocabulary << corpus), so always broadcastable.
    """
    from pyspark.sql import Window

    w = Window.orderBy("word")
    return (
        tokens_long(documents)
        .select("word")
        .distinct()
        .select(F.dense_rank().over(w).cast("int").alias("token_id"), "word")
    )


def docs_tokenized(documents: DataFrame) -> DataFrame:
    """documents -> the BASELINE.json input_hint shape.

    ``docs(doc_id string, tokens array<int32>, n_tok int32, source)``.
    token ids come from the broadcast vocab join; ``sort_array`` over
    (word_idx, token_id) structs keeps the array in document order
    regardless of shuffle order — the per-row invariant vs the reference
    is exact token-array equality.
    """
    tok = tokens_long(documents)
    v = vocab(documents)
    seq = (
        tok.join(F.broadcast(v), "word")
        .groupBy("doc_id", "source")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("word_idx", "token_id"))),
                lambda s: s["token_id"],
            ).alias("tokens")
        )
    )
    return seq.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "tokens",
        F.size("tokens").cast("int").alias("n_tok"),
        "source",
    )


def with_event_ts(df: DataFrame, doc_id: str = "doc_id") -> DataFrame:
    """Deterministic per-document event timestamp for point-in-time joins."""
    return df.withColumn(
        "event_ts",
        F.to_timestamp(
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col(doc_id) % 90).cast("int"))
        ),
    )


# The same contract as an ANSI-SQL CTE prelude, reused by oracle_sql().
# Integer division uses `//` (DuckDB CAST on doubles rounds, it does not
# truncate — `//` sidesteps that).
SQL_TOK_CTE = """
tok0 AS (
    SELECT doc_id,
           source,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS word_idx,
           unnest(string_split(text, ' ')) AS word
    FROM documents
),
tok AS (
    SELECT doc_id,
           source,
           word_idx,
           CAST(word_idx // {sent_len} AS INT) AS sent_idx,
           CAST(word_idx // {par_len_tok} AS INT) AS par_idx,
           word
    FROM tok0
    WHERE word <> ''
)""".format(sent_len=SENT_LEN, par_len_tok=SENT_LEN * PAR_LEN)
