"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct. The decode/feature-extract step is a Pandas UDF
over ``mapInPandas`` — the real Spark-side contract (schema, Arrow batch
shape, partition behavior) with the *codec* stubbed: the container ships
no image/audio libraries, so :func:`_decode_stub` computes deterministic
pseudo-features (length, checksum, fake dimensions) and the real decoder
drops in behind the same signature.

The synthetic corpus has no binary column, so :func:`binarize` derives
one deterministically from ``documents.text`` (utf-8 encode) — giving
the whole path (binary column -> mapInPandas batches -> feature struct)
an end-to-end test and a DuckDB oracle (octet_length / checksum math).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import corpus

CHECKSUM_P = 2147483647


def binarize(documents: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload binary, media_type, n_bytes)."""
    return documents.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic fake decoder (stands in for PIL/ffmpeg/librosa).

    Returns (n_bytes, checksum, fake_width, fake_height). A real decoder
    would return pixel dims / sample rate / frame count behind the same
    tuple contract. NOTE: positional byte checksum = sum((i+1)*byte) mod P.
    """
    n = len(payload)
    checksum = 0
    for i, b in enumerate(payload):
        checksum = (checksum + (i + 1) * b) % CHECKSUM_P
    return n, checksum, (checksum % 640) + 1, (checksum % 480) + 1


def decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode pass over the binary column.

    One narrow pass, no shuffle: each Arrow batch of (doc_id, payload)
    maps to a feature batch. At 100 TB the decode parallelism is the
    scan parallelism — exactly what you want for codec work.
    """
    binary = binarize(corpus.load(spark, sf_dir, "documents"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [f[0] for f in feats],
                    "checksum": [f[1] for f in feats],
                    "fake_width": [f[2] for f in feats],
                    "fake_height": [f[3] for f in feats],
                }
            )

    return binary.mapInPandas(
        decode,
        schema="doc_id long, n_bytes long, checksum long, fake_width int, fake_height int",
    )


# Oracle: the checksum is pure arithmetic over the utf-8 bytes; DuckDB
# replays it by unnesting the text's code units. ASCII corpus => code
# point == byte, so ord(ch) == byte value.
SQL_DECODE_FEATURES = f"""
WITH ch AS (
    SELECT doc_id,
           unnest(string_split(text, '')) AS c,
           generate_subscripts(string_split(text, ''), 1) AS i
    FROM documents
),
s AS (
    SELECT doc_id, SUM(i * ord(c)) % {CHECKSUM_P} AS checksum
    FROM ch GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
       CAST(s.checksum AS BIGINT) AS checksum,
       CAST(s.checksum % 640 + 1 AS INT) AS fake_width,
       CAST(s.checksum % 480 + 1 AS INT) AS fake_height
FROM documents d JOIN s USING (doc_id)"""
