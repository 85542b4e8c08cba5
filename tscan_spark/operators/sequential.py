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

Both kernels have DuckDB oracles — recursive CTEs that replay the exact
greedy scan (sql_multiword_matches) and the exact bidirectional MTLD
fold (sql_doc_mtld) — so the driver value-checks them; MTLD is
additionally golden-tested against a pure-Python reference
implementation in tests/.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import annotate, corpus

MTLD_THRESHOLD = 0.720  # reference default, src/tscan.cxx:952


def _round6(x: float) -> float:
    """Half-up 6dp round (Spark F.round / DuckDB ROUND semantics).

    Python's built-in round() is banker's rounding — on an exact tie
    (e.g. 21.0328125) it disagrees with both engines and fails the
    driver's value-hash. MTLD scores are always >= 0, so half-up equals
    half-away-from-zero here.
    """
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6

# Synthetic multi-word lexicons (surface-word phrases, space-joined).
# Mirrors the reference's phrase lexicons (intensify/formal/vzexpr
# loaders, src/tscan.cxx:332-367, 599-648, 744-776).
MW_LEXICONS: dict[str, list[str]] = {
    "mw_conn": ["value vector", "window value vector", "the table"],
    "mw_intens": ["big fast", "fast big", "small slow"],
    "mw_prep": ["the key", "a key order", "order sort", "a key order sort"],
    # M7 long negations ("niet meer", "nooit ofte nimmer" analogs,
    # checkPropNeg multi-word arm src/wordstats.cxx:269-286): each hit
    # is a dedicated propNeg increment at sentence grain
    "mw_neg": ["slow dup", "dup slow", "slow slow dup"],
}
# M2: the reference's MAX_PHRASE_LEN is 4 (multi-word situations scan
# 4-grams first, sentstats.cxx:430-537); longest-match order means a
# 4-gram beats its embedded 3-gram prefix.
MAX_PHRASE = 4


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


class _MtldScratch:
    """Reusable epoch-marked seen-buffer: the fold allocates nothing per
    call, which keeps long-lived python workers from fragmenting (a
    naive set-per-fold kernel slowed 3x over repeated runs)."""

    __slots__ = ("seen", "epoch")

    def __init__(self, size: int = 1024):
        self.seen = [0] * size
        self.epoch = 0

    def fold(self, ids, threshold: float = MTLD_THRESHOLD) -> float:
        seen = self.seen
        n = len(ids)
        if n == 0:
            return 0.0
        mx = max(ids)
        if mx >= len(seen):
            self.seen = seen = [0] * (mx * 2 + 1)
            self.epoch = 0
        self.epoch += 1
        epoch = self.epoch
        factors = 0.0
        types = 0
        cnt = 0
        ttr = 1.0
        for t in ids:
            cnt += 1
            if seen[t] != epoch:
                seen[t] = epoch
                types += 1
            ttr = types / cnt
            if ttr <= threshold:
                factors += 1.0
                self.epoch += 1
                epoch = self.epoch
                types = 0
                cnt = 0
                ttr = 1.0
        if cnt > 0:
            factors += (1.0 - ttr) / (1.0 - threshold)
        if factors == 0.0:
            factors = 1.0
        return n / factors

    def mtld_ids(self, ids) -> float:
        if not ids:
            return 0.0
        fwd = self.fold(ids)
        bwd = self.fold(ids[::-1])
        return (fwd + bwd) / 2.0




def _vocab_features(spark: SparkSession, documents: DataFrame) -> dict:
    """Vocabulary feature dict for shuffle-free kernels.

    Evaluates the SAME Spark annotation expressions over the (tiny)
    vocabulary once and collects it — the kernels then run as a narrow
    mapInPandas over raw documents with zero shuffle (the 100 TB shape:
    per-partition sequential work, dictionary broadcast). No rule drift:
    the rules are never reimplemented in Python.
    """
    v = corpus.vocab(documents)
    fake = v.select(
        F.lit(0).alias("doc_id"),
        F.lit("x").alias("source"),
        F.lit(0).alias("word_idx"),
        F.lit(0).alias("sent_idx"),
        F.lit(0).alias("par_idx"),
        "word",
    )
    ann = annotate.annotate_extended(annotate.annotate(fake))
    rows = ann.select(*_VOCAB_FEAT_COLS).collect()
    return _vocab_feature_dict(rows)


_VOCAB_FEAT_COLS = (
    "word",
    "lemma",
    "is_content",
    "is_content_strict",
    "noun_sem",
    "conn_type",
    "sit_type",
)


def _vocab_features_from_grain(grain: DataFrame) -> dict:
    """The same dict built from an ALREADY-ANNOTATED token grain (the
    unified profile's shared grain): one distinct over the vocabulary
    instead of re-deriving and re-analyzing the whole annotation ladder
    — annotations are pure functions of the word, so per-word rows are
    identical to the _vocab_features path."""
    rows = grain.select(*_VOCAB_FEAT_COLS).distinct().collect()
    return _vocab_feature_dict(rows)


def _vocab_feature_dict(rows) -> dict:
    # dense ids local to the snapshot (MTLD only needs distinctness, and
    # the fold's epoch-marked scratch indexes by id — corpus token_ids
    # are content hashes, far too sparse to index a scratch array with)
    word_ids = {w: i + 1 for i, w in enumerate(sorted({r.word for r in rows}))}
    lemma_ids = {lem: i + 1 for i, lem in enumerate(sorted({r.lemma for r in rows}))}
    feats = {}
    for r in rows:
        conn_id = (
            MTLD_CONN_CLASSES.index(r.conn_type) if r.conn_type in MTLD_CONN_CLASSES else -1
        )
        sit_id = (
            MTLD_SIT_CLASSES.index(r.sit_type) if r.sit_type in MTLD_SIT_CLASSES else -1
        )
        flags = (
            (r.is_content or 0)
            | ((r.is_content_strict or 0) << 1)
            | ((1 if r.noun_sem == "HUMAN" else 0) << 2)
        )
        feats[r.word] = (word_ids[r.word], lemma_ids[r.lemma], flags, conn_id, sit_id)
    return feats


MTLD_CONN_CLASSES = [
    "CAUSAAL", "TEMPOREEL", "CONTRASTIEF", "COMPARATIEF",
    "OPSOMMEND_WG", "OPSOMMEND_ZIN",
]
MTLD_SIT_CLASSES = ["TIME", "SPACE", "EMOTION", "CAUSE"]
# combined-connective stream: the reference concatenates the class
# streams temp -> reeks_zin -> contr -> comp -> cause (tscan.cxx:
# 1966-1973); MTLD is order-sensitive, so the concatenation order is
# semantics. OPSOMMEND_WG is excluded, as in the reference (the
# combined stream skips reeks_wg); OPSOMMEND_ZIN (reeks_zin) sits
# second, matching the reference's exact insert order.
MTLD_CONN_ALL_ORDER = [
    "TEMPOREEL", "OPSOMMEND_ZIN", "CONTRASTIEF", "COMPARATIEF", "CAUSAAL"
]
# unknown word (not in the vocab snapshot): token/lemma id 0, no flags
UNKNOWN_FEAT = (0, 0, 0, -1, -1)


def doc_mtld(
    spark: SparkSession,
    sf_dir: str,
    vocab_sf_dir: str | None = None,
    grain: DataFrame | None = None,
) -> DataFrame:
    """Per-document MTLD over the reference's full stream battery
    (calculate_MTLDs, src/tscan.cxx:1877-1975): words, lemmas, content,
    strict content, names, one stream per connective class (word-based),
    the combined connective stream excluding OPSOMMEND_WG, and one per
    situation class (lemma-based) — 15 scores.

    Shuffle-free plan: a narrow ``mapInPandas`` directly over the
    documents scan; token annotations come from the collected vocabulary
    feature dict (evaluated once with the SAME Spark expressions — see
    ``_vocab_features``). No explode, no groupBy: scan-parallel, which
    is the shape that scales linearly with executors at corpus scale.
    """
    from collections.abc import Iterator

    documents = corpus.load(spark, sf_dir, "documents")
    # the vocabulary feature dict is corpus-derived here; at production
    # scale it is a prebuilt snapshot table — vocab_sf_dir lets callers
    # point at the canonical (small) corpus instead of rescanning a
    # replicated benchmark input. Shipped as a SparkContext broadcast:
    # one torrent-distributed copy per executor instead of a re-pickled
    # closure copy per task (the round-1 transport weakness).
    feats_bc = spark.sparkContext.broadcast(
        _vocab_features_from_grain(grain)
        if grain is not None
        else _vocab_features(
            spark,
            corpus.load(spark, vocab_sf_dir, "documents") if vocab_sf_dir else documents,
        )
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
        feats = feats_bc.value
        get = feats.get
        scratch = _MtldScratch()
        m = scratch.mtld_ids
        for pdf in batches:
            res = {c: [] for c in cols}
            for text in pdf["text"]:
                toks = [get(w, UNKNOWN_FEAT) for w in text.split(" ") if w]
                tids = [t[0] for t in toks]
                res["mtld_words"].append(_round6(m(tids)))
                res["mtld_lemmas"].append(_round6(m([t[1] for t in toks])))
                res["mtld_content"].append(
                    _round6(m([t[0] for t in toks if t[2] & 1]))
                )
                res["mtld_content_strict"].append(
                    _round6(m([t[0] for t in toks if t[2] & 2]))
                )
                res["mtld_names"].append(
                    _round6(m([t[0] for t in toks if t[2] & 4]))
                )
                streams = {}
                for i, c in enumerate(MTLD_CONN_CLASSES):
                    streams[c] = [t[0] for t in toks if t[3] == i]
                    res[f"mtld_conn_{c.lower()}"].append(_round6(m(streams[c])))
                all_conn = []
                for c in MTLD_CONN_ALL_ORDER:  # reference class order
                    all_conn.extend(streams[c])
                res["mtld_conn_all"].append(_round6(m(all_conn)))
                for i, c in enumerate(MTLD_SIT_CLASSES):
                    res[f"mtld_sit_{c.lower()}"].append(
                        _round6(m([t[1] for t in toks if t[4] == i]))
                    )
            out = {"doc_id": pdf["doc_id"]}
            out.update(res)
            yield pd.DataFrame(out)

    schema = "doc_id long, " + ", ".join(f"{c} double" for c in cols)
    return documents.select("doc_id", "text").mapInPandas(kernel, schema=schema)


def sql_doc_mtld() -> str:
    """DuckDB oracle for :func:`doc_mtld` — a recursive CTE replaying
    the exact reset-on-threshold fold per (doc, stream, direction).

    The recursion state is (pos, seen-list, tokens-since-reset,
    factors); both directions run over the same list (reversed via
    ``list_reverse``); the per-direction score applies the remainder
    formula and the zero-factor clamp (tscan.cxx:1836-1850), and the
    final value is the two-direction average, exactly as the Arrow
    kernel computes it. Stream identity uses word/lemma strings — the
    kernel uses dense ids, which preserve exactly the same distinctness.
    """
    thr = "CAST(0.720 AS DOUBLE)"
    w = "b.toks[f.pos + 1]"
    seen2 = (
        f"CASE WHEN list_contains(f.seen, {w}) THEN f.seen "
        f"ELSE list_append(f.seen, {w}) END"
    )
    ttr = f"(len({seen2}) * 1.0 / (f.cnt + 1))"

    def stream_select(name: str, elem: str, cond: str | None) -> str:
        filt = f" FILTER (WHERE {cond})" if cond else ""
        return (
            f"    SELECT doc_id, '{name}' AS stream,\n"
            f"           coalesce(list({elem} ORDER BY word_idx){filt}, []) AS toks\n"
            f"    FROM annot_ext GROUP BY doc_id"
        )

    selects = [
        stream_select("mtld_words", "word", None),
        stream_select("mtld_lemmas", "lemma", None),
        stream_select("mtld_content", "word", "is_content = 1"),
        stream_select("mtld_content_strict", "word", "is_content_strict = 1"),
        stream_select("mtld_names", "word", "noun_sem = 'HUMAN'"),
    ]
    for c in MTLD_CONN_CLASSES:
        selects.append(
            stream_select(f"mtld_conn_{c.lower()}", "word", f"conn_type = '{c}'")
        )
    for c in MTLD_SIT_CLASSES:
        selects.append(
            stream_select(f"mtld_sit_{c.lower()}", "lemma", f"sit_type = '{c}'")
        )
    conn_all = "\n        || ".join(
        f"coalesce(list(word ORDER BY word_idx) FILTER (WHERE conn_type = '{c}'), [])"
        for c in MTLD_CONN_ALL_ORDER
    )
    selects.append(
        "    SELECT doc_id, 'mtld_conn_all' AS stream,\n"
        f"           {conn_all} AS toks\n"
        "    FROM annot_ext GROUP BY doc_id"
    )
    streams_cte = "streams AS (\n" + "\n    UNION ALL\n".join(selects) + "\n)"

    out_cols = (
        ["mtld_words", "mtld_lemmas", "mtld_content", "mtld_content_strict", "mtld_names"]
        + [f"mtld_conn_{c.lower()}" for c in MTLD_CONN_CLASSES]
        + ["mtld_conn_all"]
        + [f"mtld_sit_{c.lower()}" for c in MTLD_SIT_CLASSES]
    )
    pivot = ",\n       ".join(
        f"ROUND(MAX(CASE WHEN stream = '{c}' THEN score END), 6) AS {c}"
        for c in out_cols
    )

    from tscan_spark import annotate as _annotate

    return (
        "WITH RECURSIVE "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + _annotate.sql_annot_cte().strip()
        + ",\n"
        + _annotate.sql_annot_ext_cte().strip()
        + ",\n"
        + streams_cte
        + f""",
bi AS (
    SELECT doc_id, stream, 1 AS dir, toks FROM streams
    UNION ALL
    SELECT doc_id, stream, 2 AS dir, list_reverse(toks) FROM streams
),
fold (doc_id, stream, dir, pos, seen, cnt, factors) AS (
    SELECT doc_id, stream, dir, 0, CAST([] AS VARCHAR[]), 0, CAST(0 AS DOUBLE)
    FROM bi
    UNION ALL
    SELECT f.doc_id, f.stream, f.dir, f.pos + 1,
           CASE WHEN {ttr} <= {thr} THEN CAST([] AS VARCHAR[]) ELSE {seen2} END,
           CASE WHEN {ttr} <= {thr} THEN 0 ELSE f.cnt + 1 END,
           f.factors + CASE WHEN {ttr} <= {thr} THEN 1.0 ELSE 0.0 END
    FROM fold f
    JOIN bi b ON b.doc_id = f.doc_id AND b.stream = f.stream AND b.dir = f.dir
    WHERE f.pos < len(b.toks)
),
final AS (
    SELECT f.doc_id, f.stream, f.dir, len(b.toks) AS n,
           f.factors + CASE WHEN f.cnt > 0
                THEN (1.0 - len(f.seen) * 1.0 / f.cnt) / (1.0 - {thr})
                ELSE 0.0 END AS ft
    FROM fold f
    JOIN bi b ON b.doc_id = f.doc_id AND b.stream = f.stream AND b.dir = f.dir
    WHERE f.pos = len(b.toks)
),
scores AS (
    SELECT doc_id, stream,
           AVG(CASE WHEN n = 0 THEN 0.0
                    ELSE n / (CASE WHEN ft = 0.0 THEN 1.0 ELSE ft END) END) AS score
    FROM final GROUP BY doc_id, stream
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {pivot}
FROM scores
GROUP BY doc_id"""
    )


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
    """Sentence-grain greedy multi-word match counts per lexicon family.

    Shuffle-free: narrow mapInPandas over the documents scan; sentences
    are the fixed-length chunks of the tokenization contract.
    """
    from collections.abc import Iterator

    documents = corpus.load(spark, sf_dir, "documents")
    fams = sorted(MW_LEXICONS)
    lexsets = {f: set(MW_LEXICONS[f]) for f in fams}
    sent_len = corpus.SENT_LEN

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "sent_idx": []}
            for f in fams:
                rows[f"{f}_cnt"] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w.lower() for w in text.split(" ") if w]
                for si in range(0, (len(words) + sent_len - 1) // sent_len):
                    sent = words[si * sent_len : (si + 1) * sent_len]
                    rows["doc_id"].append(doc_id)
                    rows["sent_idx"].append(si)
                    for f in fams:
                        rows[f"{f}_cnt"].append(greedy_match_counts(sent, lexsets[f]))
            yield pd.DataFrame(rows)

    schema = "doc_id long, sent_idx int, " + ", ".join(f"{f}_cnt int" for f in fams)
    return documents.select("doc_id", "text").mapInPandas(kernel, schema=schema)


def sql_multiword_matches() -> str:
    """Recursive-CTE oracle replaying the greedy scans per sentence."""
    fams = sorted(MW_LEXICONS)

    def scan_cte(fam: str) -> str:
        lits = ", ".join(f"'{p}'" for p in MW_LEXICONS[fam])
        # try MAX_PHRASE..2 at pos (1-based list ops); advance greedily
        hit_at = lambda k: (
            f"pos + {k - 1} <= len(a.words) "
            f"AND array_to_string(a.words[pos:pos+{k - 1}], ' ') IN ({lits})"
        )
        step_arms = "\n             ".join(
            f"WHEN {hit_at(k)} THEN pos + {k}"
            for k in range(MAX_PHRASE, 1, -1)
        )
        any_hit = "\n               OR ".join(
            f"({hit_at(k)})" for k in range(MAX_PHRASE, 1, -1)
        )
        return f"""
scan_{fam} (doc_id, sent_idx, pos, hits) AS (
    SELECT doc_id, sent_idx, 1, 0 FROM sent_arr
    UNION ALL
    SELECT s.doc_id, s.sent_idx,
           CASE
             {step_arms}
             ELSE pos + 1
           END,
           hits + CASE
             WHEN {any_hit} THEN 1
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


# ---------------------------------------------------------------------------
# M1 checkAls backward scan (sentstats.cxx:366-424)
# ---------------------------------------------------------------------------
#
# The reference's "als" rule: when the trigger word appears, scan the
# sentence BACKWARD from the previous position; the nearest preceding
# word in the comp-set ("net ... als") makes both words COMPARATIEF,
# the nearest in the opsom-set ("zowel ... als") makes both
# OPSOMMEND_WG; if neither exists and the trigger is VG-tagged, a
# directly-preceding ADJ makes it COMPARATIEF ("groter als"), else
# CAUSAAL; a trigger at sentence position 0 is CAUSAAL outright UNLESS
# the next word is TW-tagged ("als eerste", sentstats.cxx:415-421) —
# the TW branch also catches non-VG triggers that fell through the
# whole cascade.
#
# Synthetic analog: trigger 'window' (always VG), comp-set, opsom-set:
ALS_WORD = "window"
ALS_COMP_SET = ["scan", "slow"]  # net/evenmin/zo/zomin analog
ALS_OPSOM_SET = ["spark"]  # zowel analog


def als_connectives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-grain checkAls assignments: for every trigger occurrence,
    the assigned Conn type and the partner word position (the preceding
    set-word that also receives the type).

    Pure window plan: the backward scan is
    ``last_value(flag, ignorenulls) OVER (sentence ROWS UNBOUNDED
    PRECEDING .. 1 PRECEDING)`` — nearest preceding set-word, no kernel,
    no self-join, one sort per sentence partition.
    """
    from pyspark.sql import Window

    tok = corpus.tokens_long(corpus.load(spark, sf_dir, "documents"))
    tok = tok.withColumn("tag", annotate.tag_expr(F.col("word")))
    flag = (
        F.when(F.col("word").isin(ALS_COMP_SET), "COMPARATIEF")
        .when(F.col("word").isin(ALS_OPSOM_SET), "OPSOMMEND_WG")
    )
    w = (
        Window.partitionBy("doc_id", "sent_idx")
        .orderBy("word_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tok = (
        tok.withColumn("_flag", flag)
        .withColumn("_last_flag", F.last("_flag", ignorenulls=True).over(w))
        .withColumn(
            "_last_flag_idx",
            F.last(
                F.when(flag.isNotNull(), F.col("word_idx")), ignorenulls=True
            ).over(w),
        )
        .withColumn(
            "_prev_tag",
            F.lag("tag").over(
                Window.partitionBy("doc_id", "sent_idx").orderBy("word_idx")
            ),
        )
        .withColumn(
            "_next_tag",
            F.lead("tag").over(
                Window.partitionBy("doc_id", "sent_idx").orderBy("word_idx")
            ),
        )
    )
    sent_pos = F.col("word_idx") % corpus.SENT_LEN
    tw_next = F.col("_next_tag") == "TW"
    als_conn = (
        # position 0: CAUSAAL, overridden by the "als <TW>" branch
        F.when(sent_pos == 0, F.when(tw_next, "COMPARATIEF").otherwise("CAUSAAL"))
        .when(F.col("_last_flag").isNotNull(), F.col("_last_flag"))
        .when(
            F.col("tag") == "VG",
            F.when(F.col("_prev_tag") == "ADJ", "COMPARATIEF").otherwise("CAUSAAL"),
        )
        # non-VG fall-through: only the "als <TW>" branch can still fire
        .when(tw_next, "COMPARATIEF")
        .otherwise("NONE")
    )
    return tok.where(F.col("word") == ALS_WORD).select(
        "doc_id",
        "sent_idx",
        "word_idx",
        als_conn.alias("als_conn_type"),
        F.when(F.col("_last_flag").isNotNull(), F.col("_last_flag_idx"))
        .cast("int")
        .alias("partner_word_idx"),
    )


def sql_als_connectives() -> str:
    comp = ", ".join(f"'{w}'" for w in ALS_COMP_SET)
    opsom = ", ".join(f"'{w}'" for w in ALS_OPSOM_SET)
    frame = (
        "OVER (PARTITION BY doc_id, sent_idx ORDER BY word_idx "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + f""",
alsf AS (
    SELECT tok.*,
           {annotate.sql_tag("word")} AS tag,
           CASE WHEN word IN ({comp}) THEN 'COMPARATIEF'
                WHEN word IN ({opsom}) THEN 'OPSOMMEND_WG' END AS flag
    FROM tok
),
alsw AS (
    SELECT *,
           last_value(flag IGNORE NULLS) {frame} AS last_flag,
           last_value(CASE WHEN flag IS NOT NULL THEN word_idx END IGNORE NULLS)
               {frame} AS last_flag_idx,
           lag(tag) OVER (PARTITION BY doc_id, sent_idx ORDER BY word_idx)
               AS prev_tag,
           lead(tag) OVER (PARTITION BY doc_id, sent_idx ORDER BY word_idx)
               AS next_tag
    FROM alsf
)
SELECT doc_id, sent_idx, word_idx,
       CASE WHEN word_idx % {corpus.SENT_LEN} = 0 THEN
                 CASE WHEN next_tag = 'TW' THEN 'COMPARATIEF' ELSE 'CAUSAAL' END
            WHEN last_flag IS NOT NULL THEN last_flag
            WHEN tag = 'VG' THEN
                 CASE WHEN prev_tag = 'ADJ' THEN 'COMPARATIEF' ELSE 'CAUSAAL' END
            WHEN next_tag = 'TW' THEN 'COMPARATIEF'
            ELSE 'NONE' END AS als_conn_type,
       CAST(CASE WHEN last_flag IS NOT NULL THEN last_flag_idx END AS INT)
           AS partner_word_idx
FROM alsw
WHERE word = '{ALS_WORD}'"""
    )
