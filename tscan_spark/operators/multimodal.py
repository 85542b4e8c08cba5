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


# SOF segment markers that carry JPEG frame dimensions (ITU T.81 table
# B.1: baseline/extended/progressive/lossless + differential variants;
# C4/C8/CC are DHT/JPG/DAC, not frames)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)

# PNG color type -> sample channels (PNG spec 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(payload: bytes) -> tuple[str, int, int, int] | None:
    """REAL image-header codec (round-4 advice #7): width/height/
    channels parsed straight from the byte payload — pure
    public-knowledge struct parsing (PNG spec ISO 15948, JPEG ITU T.81,
    GIF89a spec), no image library.  Returns
    ``(format, width, height, n_channels)`` or None for unrecognized
    payloads (the synthetic text corpus falls through to the stub).
    """
    n = len(payload)
    # PNG: 8-byte signature, then the IHDR chunk (len+type+13 bytes)
    if n >= 26 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        ch = _PNG_CHANNELS.get(payload[25])
        if ch and 0 < w and 0 < h:
            return ("png", w, h, ch)
        return None
    # JPEG: SOI then marker segments until a SOF frame header
    if n >= 4 and payload[0] == 0xFF and payload[1] == 0xD8:
        i = 2
        while i + 3 < n:
            if payload[i] != 0xFF:
                return None
            # fill bytes before a marker are legal
            while i + 1 < n and payload[i + 1] == 0xFF:
                i += 1
            marker = payload[i + 1]
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                i += 2  # standalone marker, no length field
                continue
            if i + 4 > n:
                return None
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if marker in _JPEG_SOF:
                # precision(1) height(2) width(2) n_components(1)
                if i + 10 > n:
                    return None
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("jpeg", w, h, payload[i + 9])
            if seg_len < 2:
                return None
            i += 2 + seg_len
        return None
    # GIF: 6-byte version tag, then logical screen w/h little-endian
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return ("gif", w, h, 3)
    return None


def decode_binary(binary: DataFrame) -> DataFrame:
    """mapInPandas decode pass over a (doc_id, payload) frame.

    One narrow pass, no shuffle: each Arrow batch of (doc_id, payload)
    maps to a feature batch. At 100 TB the decode parallelism is the
    scan parallelism — exactly what you want for codec work.  Real
    PNG/JPEG/GIF payloads get header-parsed dimensions
    (:func:`parse_image_header`); anything else carries NULL image
    columns and the deterministic stub features.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stub = [_decode_stub(p) for p in pdf["payload"]]
            hdr = [parse_image_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [f[0] for f in stub],
                    "checksum": [f[1] for f in stub],
                    "fake_width": [f[2] for f in stub],
                    "fake_height": [f[3] for f in stub],
                    "img_format": [h[0] if h else None for h in hdr],
                    "img_width": [h[1] if h else None for h in hdr],
                    "img_height": [h[2] if h else None for h in hdr],
                    "img_channels": [h[3] if h else None for h in hdr],
                }
            )

    return binary.mapInPandas(
        decode,
        schema=(
            "doc_id long, n_bytes long, checksum long, "
            "fake_width int, fake_height int, img_format string, "
            "img_width int, img_height int, img_channels int"
        ),
    )


def decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered decode pass over the corpus-derived binary column."""
    return decode_binary(binarize(corpus.load(spark, sf_dir, "documents")))


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
       CAST(s.checksum % 480 + 1 AS INT) AS fake_height,
       CAST(NULL AS VARCHAR) AS img_format,
       CAST(NULL AS INT) AS img_width,
       CAST(NULL AS INT) AS img_height,
       CAST(NULL AS INT) AS img_channels
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
