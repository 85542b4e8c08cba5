"""S7 lexicon FILE loaders with the reference's exact load semantics.

The reference loads ~17 tab-separated lexicon files at startup
(/root/reference/src/tscan.cxx:445-860).  Two loaders carry non-obvious
semantics the engine must reproduce when ingesting real lexicon files:

- ``fill_freqlex`` (tscan.cxx:445-476): 4-column TSV
  (word \\t count \\t ? \\t cum_freq).  Loading STOPS at the first
  singleton row (count == 1 — "skip all singleton stuff") and, when a
  frequency clip is configured, at the first row whose cumulative
  frequency exceeds the clip.  ``total`` is the sum of loaded counts
  only — the truncation therefore changes every downstream freqLog.
- ``fill_topvals`` (tscan.cxx:492-534): 4-column TSV where the BAND is
  the 1-based line number (top1000 for lines 1-1000, top2000 to 2000,
  top3000, top5000, top10000, top20000 beyond 10000).

These run on the DRIVER (lexicons are small config data, exactly like
the reference's in-RAM maps) and become broadcast dimension DataFrames;
at production scale the loaded frame is written once to a versioned
snapshot table (see operators/asof.py) rather than re-read per job.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame, SparkSession

from tscan_spark.functions.scalars import FP_SCALE  # noqa: F401  (doc parity)

TOP_BANDS = [
    (1000, "top1000"),
    (2000, "top2000"),
    (3000, "top3000"),
    (5000, "top5000"),
    (10000, "top10000"),
]
TOP_DEFAULT = "top20000"


def parse_freqlex(
    lines, freq_clip: float = 0.0
) -> tuple[list[tuple[str, int, float]], int]:
    """fill_freqlex semantics: returns (rows, total).

    rows = (word, count, cum_freq); loading stops at the first
    count==1 row and (if freq_clip > 0) at the first cum_freq >
    freq_clip row; total sums only the loaded counts.
    """
    rows: list[tuple[str, int, float]] = []
    total = 0
    for raw in lines:
        line = raw.strip()
        if not line:
            continue
        parts = line.split("\t")
        if len(parts) != 4:
            continue  # reference: skip malformed lines
        word, count_s, _, freq_s = parts
        count = int(count_s)
        freq = float(freq_s)
        if count == 1:
            break  # first singleton truncates the whole tail
        if freq_clip > 0 and freq > freq_clip:
            break
        total += count
        rows.append((word, count, freq))
    return rows, total


def parse_topvals(lines) -> list[tuple[str, str]]:
    """fill_topvals semantics: band by 1-based line number."""
    out: list[tuple[str, str]] = []
    line_no = 0
    for raw in lines:
        line = raw.strip()
        if not line:
            continue
        line_no += 1
        band = TOP_DEFAULT
        for thr, name in TOP_BANDS:
            if line_no <= thr:
                band = name
                break
        parts = line.split("\t")
        if len(parts) != 4:
            continue
        out.append((parts[0], band))
    return out


def load_freqlex(
    spark: SparkSession, path_or_text: str, freq_clip: float = 0.0, is_text: bool = False
) -> DataFrame:
    """Load a 4-col frequency TSV into a broadcastable dim with the
    reference's truncation semantics + a freq_log derived from the
    truncated total (freqLog, tscan.cxx:1617-1621)."""
    import math

    if is_text:
        lines = io.StringIO(path_or_text)
    else:
        lines = open(path_or_text, encoding="utf-8")
    with lines:
        rows, total = parse_freqlex(lines, freq_clip=freq_clip)
    data = [
        (w, c, f, math.log10((c + 1.0) / max(total, 1) * 1.0e9)) for w, c, f in rows
    ]
    return spark.createDataFrame(
        data, schema="word string, count long, cum_freq double, freq_log double"
    )


def load_topvals(spark: SparkSession, path_or_text: str, is_text: bool = False) -> DataFrame:
    if is_text:
        lines = io.StringIO(path_or_text)
    else:
        lines = open(path_or_text, encoding="utf-8")
    with lines:
        rows = parse_topvals(lines)
    return spark.createDataFrame(rows, schema="word string, band string")


def parse_prevalences(lines) -> list[tuple[str, float, float]]:
    """fill_prevalences (tscan.cxx:707-742): 6-column whitespace rows;
    '#' comments and malformed lines skipped; percentage/zscore from
    columns 3 and 4 keyed by the lemma in column 1."""
    out: list[tuple[str, float, float]] = []
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) != 6:
            continue
        out.append((parts[0], float(parts[2]), float(parts[3])))
    return out
