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


# ---------------------------------------------------------------------------
# Resize + frame-sample plumbing (codec stubbed, Spark contract real)
# ---------------------------------------------------------------------------

RESIZE_STRIDE = 4  # keep every 4th byte — the "downsample" stub
FRAME_SIZE = 64  # bytes per synthetic video frame
SAMPLE_EVERY = 3  # keep frames 0, 3, 6, ...


def resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas "resize" pass: payload -> strided-downsample payload.

    A real image resize (PIL.thumbnail) drops in behind the same
    batch-in/batch-out signature; the stub keeps every
    ``RESIZE_STRIDE``-th byte — deterministic, and the DuckDB oracle
    replays it with substring arithmetic over the ASCII corpus.  Same
    scale story as decode: one narrow pass, decode parallelism = scan
    parallelism, the resized payload stays binary inside the engine
    (only checksum/length/preview surface for value comparison).
    """
    binary = binarize(corpus.load(spark, sf_dir, "documents"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                small = bytes(payload[::RESIZE_STRIDE])
                n, checksum, _, _ = _decode_stub(small)
                rows.append(
                    (doc_id, len(payload), n, checksum, small[:16].decode("utf-8"))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "resized_n_bytes",
                    "resized_checksum",
                    "preview",
                ],
            )

    return binary.mapInPandas(
        resize,
        schema=(
            "doc_id long, n_bytes long, resized_n_bytes long, "
            "resized_checksum long, preview string"
        ),
    )


SQL_RESIZE_FEATURES = f"""
WITH small AS (
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           list_aggregate(
               list_transform(
                   range(1, len(text) + 1, {RESIZE_STRIDE}),
                   i -> substring(text, CAST(i AS INT), 1)),
               'string_agg', '') AS s
    FROM documents
),
ch AS (
    SELECT doc_id,
           unnest(string_split(s, '')) AS c,
           generate_subscripts(string_split(s, ''), 1) AS i
    FROM small
),
cs AS (SELECT doc_id, SUM(i * ord(c)) % {CHECKSUM_P} AS checksum
       FROM ch GROUP BY doc_id)
SELECT small.doc_id,
       CAST(small.n_bytes AS BIGINT) AS n_bytes,
       CAST(len(small.s) AS BIGINT) AS resized_n_bytes,
       CAST(cs.checksum AS BIGINT) AS resized_checksum,
       substring(small.s, 1, 16) AS preview
FROM small JOIN cs USING (doc_id)"""


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas frame-sampling pass: payload -> every Nth frame.

    Treats the payload as fixed-``FRAME_SIZE``-byte frames (the ffmpeg
    keyframe-extract analog) and emits one ROW PER SAMPLED FRAME — the
    batch-explode shape (one input row -> many output rows) that a real
    video pipeline needs from mapInPandas.  Row fan-out happens inside
    the narrow pass; no shuffle until a consumer aggregates.
    """
    binary = binarize(corpus.load(spark, sf_dir, "documents"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + FRAME_SIZE - 1) // FRAME_SIZE
                for fi in range(0, n_frames, SAMPLE_EVERY):
                    frame = payload[fi * FRAME_SIZE : (fi + 1) * FRAME_SIZE]
                    fn, fcs, _, _ = _decode_stub(frame)
                    rows.append((doc_id, fi, fn, fcs))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_checksum"]
            )

    return binary.mapInPandas(
        sample,
        schema="doc_id long, frame_idx int, frame_bytes long, frame_checksum long",
    ).orderBy("doc_id", "frame_idx")


SQL_FRAME_SAMPLE = f"""
WITH f AS (
    SELECT doc_id, text,
           CAST(ceil(len(text) / {FRAME_SIZE}.0) AS INT) AS n_frames
    FROM documents
),
frames AS (
    SELECT doc_id,
           CAST(unnest(range(0, n_frames, {SAMPLE_EVERY})) AS INT) AS frame_idx,
           text
    FROM f
),
fr AS (
    SELECT doc_id, frame_idx,
           substring(text, frame_idx * {FRAME_SIZE} + 1, {FRAME_SIZE}) AS frame,
           len(substring(text, frame_idx * {FRAME_SIZE} + 1, {FRAME_SIZE}))
               AS frame_bytes
    FROM frames
),
ch AS (
    SELECT doc_id, frame_idx,
           unnest(string_split(frame, '')) AS c,
           generate_subscripts(string_split(frame, ''), 1) AS i
    FROM fr
)
SELECT fr.doc_id,
       fr.frame_idx,
       CAST(fr.frame_bytes AS BIGINT) AS frame_bytes,
       CAST(COALESCE(SUM(ch.i * ord(ch.c)) % {CHECKSUM_P}, 0) AS BIGINT)
           AS frame_checksum
FROM fr LEFT JOIN ch USING (doc_id, frame_idx)
GROUP BY 1, 2, 3
ORDER BY doc_id, frame_idx"""
