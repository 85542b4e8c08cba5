"""Text-format document sources: JSONL (and CSV) ingestion contracts.

The reference ingests FoLiA XML (and plain text via Frog); a web-scale
pipeline's interchange format is JSONL — one document object per line,
splittable, schema-on-read.  This module pins the engine's JSONL
contract: an EXPLICIT schema passed to the reader (never inferSchema —
schema inference is a full extra pass over 100 TB and type-drifts on
dirty data), permissive mode with a corrupt-record column so bad lines
surface as data instead of job failures.

``jsonl_roundtrip`` is the registered demonstration: write the
documents table as JSONL, read it back under the pinned schema, and
prove losslessness with per-source content digests that a DuckDB
oracle recomputes from the original parquet.  At production scale the
write is the ingest job's output contract; the read is the next
stage's scan (same splittable parallelism as parquet, minus columnar
pruning — which is why staging tables convert to parquet after
validation).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tscan_spark import corpus

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def write_jsonl(docs: DataFrame, path: str) -> None:
    docs.write.mode("overwrite").json(path)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced permissive JSONL scan of the documents table."""
    return (
        spark.read.schema(DOCS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .drop("_corrupt_record")
    )


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> JSONL -> schema-enforced read -> per-source digest.

    The digest (doc count, char total, xor-free ORDER-FREE sum of text
    content hashes mod p) is reduction-order independent, so equality
    with the oracle (computed from the ORIGINAL parquet) proves the
    JSONL round trip preserved every row's content.
    """
    import uuid

    # per-run unique path: the write is eager but the returned frame's
    # read is deferred, so a shared fixed path would let a concurrent
    # run overwrite the directory between this write and our read
    # (round-4 advice); app id scopes per session, uuid per call
    tag = os.path.basename(os.path.normpath(sf_dir))
    run = f"{spark.sparkContext.applicationId}_{uuid.uuid4().hex[:8]}"
    path = f"/tmp/tscan_jsonl_{tag}_{run}"
    docs = corpus.load(spark, sf_dir, "documents")
    write_jsonl(docs, path)
    back = read_documents_jsonl(spark, path)
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
            (F.sum(corpus.content_hash_expr("text")) % corpus.HASH_MOD)
            .cast("long")
            .alias("content_digest"),
        )
        .orderBy("source")
    )


SQL_JSONL_ROUNDTRIP = f"""
SELECT source,
       CAST(COUNT(*) AS INT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       CAST(SUM({corpus.sql_content_hash("text")}) % {corpus.HASH_MOD} AS BIGINT)
           AS content_digest
FROM documents
GROUP BY source
ORDER BY source
"""


CSV_OPTIONS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "multiLine": "false",
    "mode": "PERMISSIVE",
    # disambiguate '' from NULL: nulls travel as an explicit sentinel,
    # empty strings as a quoted empty field (round-4 advice — the
    # default read nullValue '' silently turns empty text into NULL).
    # emptyValue is deliberately NOT set: the write default already
    # emits a quoted "" for empty strings and the read default maps a
    # quoted-empty field back to '' — setting emptyValue='""' on READ
    # would make Spark emit the literal two-character string instead.
    "nullValue": "\\N",
}

CSV_SCHEMA = T.StructType([f for f in DOCS_SCHEMA if f.name != "_corrupt_record"])


def write_csv(docs: DataFrame, path: str) -> None:
    # write in pinned schema order: CSV columns are positional under an
    # explicit read schema, so the writer — not the caller's projection
    # order — owns the layout (round-4 advice)
    w = docs.select(*[f.name for f in CSV_SCHEMA]).write.mode("overwrite")
    for k, v in CSV_OPTIONS.items():
        if k not in ("mode",):
            w = w.option(k, v)
    w.csv(path)


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced CSV scan (header + RFC-4180 quoting); the same
    explicit-schema rule as JSONL — inferSchema is a second full pass
    and type-drifts on dirty data.

    ``enforceSchema=false`` makes Spark VALIDATE the file header
    against the explicit schema instead of applying it positionally —
    a reordered or foreign CSV fails loudly rather than producing
    silently transposed rows (round-4 advice)."""
    r = spark.read.schema(CSV_SCHEMA).option("enforceSchema", "false")
    for k, v in CSV_OPTIONS.items():
        r = r.option(k, v)
    return r.csv(path)
