"""Order-sensitive sequential kernels (SURVEY.md §2.3, A5).

These are the operators Spark's built-in aggregates cannot express —
greedy scans and reset-on-threshold folds over the token *sequence* —
implemented as Arrow-vectorized ``applyInPandas`` kernels over doc
groups (never per-row Python UDFs).

MTLD (McCarthy & Jarvis; reference ``calculate_mtld``
/root/reference/src/tscan.cxx:1806-1855):
  running type-token ratio over the stream; every time TTR drops to
  <= the threshold (0.720) the factor count increments and the
  types/tokens state resets; the remainder contributes
  (1 - ttr) / (1 - threshold) partial factor; score = N / factors;
  final value is the average of the forward and reversed sequence
  (``average_mtld`` src/tscan.cxx:1857-1875). Computed per document for
  several token streams (words, lemmas, content words — the reference
  runs 15 streams, src/tscan.cxx:1877-1975).

Greedy multi-word matching (template ``resolveMultiWord``
include/tscan/stats.h:966-991; instances M1/M2/M4-M6
src/sentstats.cxx:270-537, src/tscan.cxx:2910-2995):
  scan the sentence left to right; at each position try the longest
  phrase (up to MAX_PHRASE words) against the lexicon; on a hit, count
  it and jump past the consumed words; else advance one.

The greedy matcher also has a DuckDB oracle — a recursive CTE that
replays the exact scan — so the driver can value-check it; MTLD is
checked rows-only by the driver and golden-tested against a pure-Python
reference implementation in tests/.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import annotate, corpus

MTLD_THRESHOLD = 0.720  # reference default, src/tscan.cxx:952

# Synthetic multi-word lexicons (surface-word phrases, space-joined).
# Mirrors the reference's phrase lexicons (intensify/formal/vzexpr
# loaders, src/tscan.cxx:332-367, 599-648, 744-776).
MW_LEXICONS: dict[str, list[str]] = {
    "mw_conn": ["value vector", "window value vector", "the table"],
    "mw_intens": ["big fast", "fast big", "small slow"],
    "mw_prep": ["the key", "a key order", "order sort"],
}
MAX_PHRASE = 3


def mtld_fold(tokens: list[str], threshold: float = MTLD_THRESHOLD) -> float:
    """Single-direction MTLD factor fold (tscan.cxx:1806-1855)."""
    factors = 0.0
    types: set[str] = set()
    token_cnt = 0
    ttr = 1.0
    for t in tokens:
        token_cnt += 1
        types.add(t)
        ttr = len(types) / token_cnt
        if ttr <= threshold:
            factors += 1.0
            types.clear()
            token_cnt = 0
            ttr = 1.0
    if token_cnt > 0:
        factors += (1.0 - ttr) / (1.0 - threshold)
    if factors == 0.0:
        # reference quirk: zero factors clamp to 1, so an all-unique
        # stream scores N (tscan.cxx:1849-1850), not 0
        factors = 1.0
    return len(tokens) / factors


def mtld(tokens: list[str]) -> float:
    """Bidirectional average (average_mtld, tscan.cxx:1857-1875)."""
    if not tokens:
        return 0.0
    fwd = mtld_fold(tokens)
    bwd = mtld_fold(list(reversed(tokens)))
    return (fwd + bwd) / 2.0


MTLD_CONN_CLASSES = ["CAUSAAL", "TEMPOREEL", "CONTRASTIEF", "COMPARATIEF", "OPSOMMEND_WG"]
MTLD_SIT_CLASSES = ["TIME", "SPACE", "EMOTION", "CAUSE"]


def doc_mtld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MTLD over the reference's full stream battery
    (calculate_MTLDs, src/tscan.cxx:1877-1975): words, lemmas, content,
    strict content, names, one stream per connective class (word-based),
    the combined connective stream excluding OPSOMMEND_WG, and one per
    situation class (lemma-based) — 15 scores.

    The streams ship to Python as dense int ids (vocab/lemma ranks),
    not strings: ~2x less Arrow volume and faster set folds. Arrays are
    assembled JVM-side (sorted struct collects); the fold runs via
    ``mapInPandas`` over whole Arrow batches of documents.
    """
    from collections.abc import Iterator

    documents = corpus.load(spark, sf_dir, "documents")
    tok = annotate.annotate(corpus.tokens_long(documents))
    tok = annotate.annotate_extended(tok)
    v = corpus.vocab(documents)
    from pyspark.sql import Window

    lem_v = (
        tok.select("lemma")
        .distinct()
        .select(
            "lemma",
            F.dense_rank().over(Window.orderBy("lemma")).cast("int").alias("lemma_id"),
        )
    )
    t = tok.join(F.broadcast(v), "word").join(F.broadcast(lem_v), "lemma")
    # pack the boolean stream gates into one int (bit0 content, bit1
    # strict, bit2 name-analog = HUMAN semantic type)
    flags = (
        F.col("is_content")
        + F.col("is_content_strict") * 2
        # null-safe: noun_sem is NULL for non-N/ADJ tags
        + F.coalesce((F.col("noun_sem") == "HUMAN").cast("int"), F.lit(0)) * 4
    )
    conn_id = F.lit(-1)
    for i, c in enumerate(MTLD_CONN_CLASSES):
        conn_id = F.when(F.col("conn_type") == c, i).otherwise(conn_id)
    sit_id = F.lit(-1)
    for i, c in enumerate(MTLD_SIT_CLASSES):
        sit_id = F.when(F.col("sit_type") == c, i).otherwise(sit_id)

    def arr(col, name):
        return F.transform(
            F.sort_array(F.collect_list(F.struct("word_idx", col.alias("v")))),
            lambda st: st["v"],
        ).alias(name)

    grouped = t.select(
        "doc_id",
        "word_idx",
        F.col("token_id").cast("int").alias("tid"),
        "lemma_id",
        flags.cast("int").alias("flags"),
        conn_id.cast("int").alias("conn_id"),
        sit_id.cast("int").alias("sit_id"),
    ).groupBy("doc_id").agg(
        arr(F.col("tid"), "tids"),
        arr(F.col("lemma_id"), "lids"),
        arr(F.col("flags"), "flags"),
        arr(F.col("conn_id"), "conn"),
        arr(F.col("sit_id"), "sit"),
    )

    n_conn = len(MTLD_CONN_CLASSES)
    n_sit = len(MTLD_SIT_CLASSES)
    cols = (
        ["mtld_words", "mtld_lemmas", "mtld_content", "mtld_content_strict", "mtld_names"]
        + [f"mtld_conn_{c.lower()}" for c in MTLD_CONN_CLASSES]
        + ["mtld_conn_all"]
        + [f"mtld_sit_{c.lower()}" for c in MTLD_SIT_CLASSES]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"]}
            res = {c: [] for c in cols}
            for tids, lids, fl, conn, sit in zip(
                pdf["tids"], pdf["lids"], pdf["flags"], pdf["conn"], pdf["sit"]
            ):
                tids, lids = list(tids), list(lids)
                res["mtld_words"].append(round(mtld(tids), 6))
                res["mtld_lemmas"].append(round(mtld(lids), 6))
                res["mtld_content"].append(
                    round(mtld([t for t, f in zip(tids, fl) if f & 1]), 6)
                )
                res["mtld_content_strict"].append(
                    round(mtld([t for t, f in zip(tids, fl) if f & 2]), 6)
                )
                res["mtld_names"].append(
                    round(mtld([t for t, f in zip(tids, fl) if f & 4]), 6)
                )
                all_conn = []
                for i, c in enumerate(MTLD_CONN_CLASSES):
                    stream = [t for t, k in zip(tids, conn) if k == i]
                    res[f"mtld_conn_{c.lower()}"].append(round(mtld(stream), 6))
                    if c != "OPSOMMEND_WG":  # combined excludes reeks_wg
                        all_conn.extend(stream)
                res["mtld_conn_all"].append(round(mtld(all_conn), 6))
                for i, c in enumerate(MTLD_SIT_CLASSES):
                    res[f"mtld_sit_{c.lower()}"].append(
                        round(mtld([t for t, k in zip(lids, sit) if k == i]), 6)
                    )
            out.update(res)
            yield pd.DataFrame(out)

    schema = "doc_id long, " + ", ".join(f"{c} double" for c in cols)
    return grouped.mapInPandas(kernel, schema=schema)


def greedy_match_counts(words: list[str], phrases: set[str], max_len: int = MAX_PHRASE) -> int:
    """Greedy longest-match scan with consumption (stats.h:966-991)."""
    hits = 0
    i = 0
    n = len(words)
    while i < n:
        matched = 0
        for ln in range(min(max_len, n - i), 1, -1):
            if " ".join(words[i : i + ln]) in phrases:
                matched = ln
                break
        if matched:
            hits += 1
            i += matched
        else:
            i += 1
    return hits


def multiword_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-grain greedy multi-word match counts for each lexicon
    family, summed to (doc, sentence) rows."""
    from collections.abc import Iterator

    tok = corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))
    grouped = tok.groupBy("doc_id", "sent_idx").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("word_idx", F.lower(F.col("word")).alias("v")))
            ),
            lambda s: s["v"],
        ).alias("words")
    )
    fams = sorted(MW_LEXICONS)
    lexsets = {f: set(MW_LEXICONS[f]) for f in fams}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "sent_idx": pdf["sent_idx"]}
            for f in fams:
                out[f"{f}_cnt"] = [
                    greedy_match_counts(list(w), lexsets[f]) for w in pdf["words"]
                ]
            yield pd.DataFrame(out)

    schema = "doc_id long, sent_idx int, " + ", ".join(f"{f}_cnt int" for f in fams)
    return grouped.mapInPandas(kernel, schema=schema)


def sql_multiword_matches() -> str:
    """Recursive-CTE oracle replaying the greedy scans per sentence."""
    fams = sorted(MW_LEXICONS)

    def scan_cte(fam: str) -> str:
        lits = ", ".join(f"'{p}'" for p in MW_LEXICONS[fam])
        # try length 3 then 2 at pos (1-based list ops); advance greedily
        return f"""
scan_{fam} (doc_id, sent_idx, pos, hits) AS (
    SELECT doc_id, sent_idx, 1, 0 FROM sent_arr
    UNION ALL
    SELECT s.doc_id, s.sent_idx,
           CASE
             WHEN pos + 2 <= len(a.words)
                  AND array_to_string(a.words[pos:pos+2], ' ') IN ({lits}) THEN pos + 3
             WHEN pos + 1 <= len(a.words)
                  AND array_to_string(a.words[pos:pos+1], ' ') IN ({lits}) THEN pos + 2
             ELSE pos + 1
           END,
           hits + CASE
             WHEN (pos + 2 <= len(a.words)
                   AND array_to_string(a.words[pos:pos+2], ' ') IN ({lits}))
               OR (pos + 1 <= len(a.words)
                   AND array_to_string(a.words[pos:pos+1], ' ') IN ({lits})) THEN 1
             ELSE 0
           END
    FROM scan_{fam} s
    JOIN sent_arr a USING (doc_id, sent_idx)
    WHERE pos <= len(a.words)
),
final_{fam} AS (
    SELECT doc_id, sent_idx, MAX(hits) AS {fam}_cnt
    FROM scan_{fam}
    GROUP BY doc_id, sent_idx
)"""

    joins = "\n".join(f"JOIN final_{f} USING (doc_id, sent_idx)" for f in fams)
    cols = ",\n       ".join(f"CAST({f}_cnt AS INT) AS {f}_cnt" for f in fams)
    return (
        "WITH RECURSIVE "
        + corpus.SQL_TOK_CTE.strip().replace("tok0 AS", "tok0 AS", 1)
        + """,
sent_arr AS (
    SELECT doc_id, sent_idx, list(lower(word) ORDER BY word_idx) AS words
    FROM tok
    GROUP BY doc_id, sent_idx
),"""
        + ",".join(scan_cte(f) for f in fams)
        + f"""
SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx,
       {cols}
FROM sent_arr
{joins}"""
    )
