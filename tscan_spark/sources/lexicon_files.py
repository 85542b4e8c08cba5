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


# ---------------------------------------------------------------------------
# fillN — the 6-column nouns_semtype.data format (tscan.cxx:223-262)
# ---------------------------------------------------------------------------

# SEM::classifyNoun (src/sem.cxx:159-192) mapped onto the engine's
# coarse semantic classes (the fan-out batteries count CONCRETE /
# ABSTRACT / HUMAN). "undefined" loads but classifies to no class
# (UNDEFINED_NOUN — present in the lexicon, counted in neither class);
# unknown strings classify as UNFOUND (None here, sem_unfound
# downstream). The reference's BROAD_CONCRETE place/time/measure map to
# CONCRETE — the engine's broad/strict axis is the N/ADJ tag gate, not
# a per-class split.
NOUN_SEM_CLASSES: dict[str, str | None] = {
    "undefined": None,
    "human": "HUMAN",
    "concrother": "CONCRETE",
    "institut": "CONCRETE",
    "substance_conc": "CONCRETE",
    "artefact": "CONCRETE",
    "nonhuman": "CONCRETE",
    "voed_verz": "CONCRETE",
    "dynamic_conc": "CONCRETE",
    "place": "CONCRETE",
    "time": "CONCRETE",
    "measure": "CONCRETE",
    "substance_abstr": "ABSTRACT",
    "dynamic_abstr": "ABSTRACT",
    "nondynamic": "ABSTRACT",
}


def parse_nouns_semtype(
    lines,
) -> list[tuple[str, str, str | None, int, str | None, str | None, int | None]]:
    """fillN semantics (tscan.cxx:223-262): tab-separated rows of either
    3 values (word, semtype, is_compound) or 6 (plus head,
    satellite_clean, compound_parts); any other arity is skipped with
    the reference's "skip line" behavior. Returns rows
    (word, sem_type, sem_class, is_compound, head, satellite, parts).
    """
    out = []
    for raw in lines:
        line = raw.strip()
        if not line:
            continue
        parts = line.split("\t")
        if len(parts) not in (3, 6):
            continue  # reference: "skip line ... expected 3 or 6 values"
        word, semtype, comp_s = parts[0], parts[1], parts[2]
        is_comp = 1 if comp_s == "1" else 0
        head = sat = None
        n_parts = None
        if is_comp and len(parts) == 6:
            head, sat = parts[3], parts[4]
            try:
                n_parts = int(parts[5])
            except ValueError:
                n_parts = 0  # reference atoi() semantics
        out.append(
            (
                word,
                semtype,
                NOUN_SEM_CLASSES.get(semtype),
                is_comp,
                head,
                sat,
                n_parts,
            )
        )
    return out


def load_nouns_semtype(
    spark: SparkSession, path_or_text: str, is_text: bool = False
) -> DataFrame:
    """Load a fillN-format nouns file into a broadcastable dimension:
    (word, sem_type, sem_class, is_compound, comp_head, comp_sat,
    comp_parts). Feeds the W10/W11 classification and the W25 compound
    head/satellite block via :func:`tscan_spark.annotate.nouns_dim_lookup`
    (broadcast findInflected cascade)."""
    if is_text:
        lines = io.StringIO(path_or_text)
    else:
        lines = open(path_or_text, encoding="utf-8")
    with lines:
        rows = parse_nouns_semtype(lines)
    return spark.createDataFrame(
        rows,
        schema=(
            "word string, sem_type string, sem_class string, is_compound int,"
            " comp_head string, comp_sat string, comp_parts int"
        ),
    )


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
