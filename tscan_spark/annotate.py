"""Deterministic token annotation — the "synthetic Frog".

The reference's per-word inputs (CGN tag, lemma, etc.) come from the
Frog NLP service (/root/reference/src/tscan.cxx:3131-3231).  The engine
consumes *pre-annotated* tokens; for the synthetic corpus the annotations
are deterministic pure functions of the surface word, defined ONCE here
as Python constants and rendered into BOTH

- Spark broadcast-lexicon DataFrames / column expressions, and
- ANSI-SQL literals for the DuckDB oracle,

so the two sides can never drift.

Classifier families mirrored from the reference (SURVEY.md §2.2):

- CGN head tag decode          (W3,  src/cgn.cxx:356-383)
- lemma derivation             (Frog analog; suffix strip)
- content-word flag            (W23, src/wordstats.cxx:17-33)
- proposition negation         (W6,  src/wordstats.cxx:255-286)
- connective classification    (W8,  src/tscan.cxx:1134-1181)
- situation classification     (W9,  src/tscan.cxx:1183-1217)
- intensifier / formal lookup  (W12/W13, src/tscan.cxx:1467-1507)
- stop-lemma flag              (W18, src/tscan.cxx:1583-1595)
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Rule constants (single source of truth for Spark AND the SQL oracle)
# ---------------------------------------------------------------------------

# CGN head tag by first letter of the word — stands in for CGN::toCGN
# (reference decodes Frog's tagset, src/cgn.cxx:356-383). The band set
# covers the CGN classes the reference's rules actually branch on:
# VZ feeds the {VG,VZ,BW} connective gate (tscan.cxx:1134-1181) and the
# prep head of the PREP_OBJ1 dependency pair (Alpino.cxx:556-583); TW
# feeds the checkAls "als <TW>" branch (sentstats.cxx:415-421).
TAG_BANDS = [
    ("a", "e", "N"),
    ("f", "f", "VZ"),
    ("g", "m", "WW"),
    ("n", "q", "ADJ"),
    ("r", "r", "TW"),
    ("s", "s", "BW"),
    ("t", "u", "VNW"),
    ("v", "z", "VG"),
]

# lemma = word minus plural-ish suffix (Frog lemmatizer stand-in): strip a
# trailing 's' when len > 4 (keeps 'hash' intact, maps 'windows'->'window').
LEMMA_MIN_LEN = 5

# W6 checkPropNeg: 31-word negative list in the reference
# (src/wordstats.cxx:255-286); synthetic analog:
NEG_WORDS = ["slow", "dup"]

# W18 stop lemmata (src/tscan.cxx:778-813): excluded from content counts
# but kept in *InclCnt (src/tscan.cxx:2288-2292).
STOP_LEMMATA = ["the", "a"]

# W8 connective lexicon: (lemma -> class), gated on tag in {VG, VZ, BW}
# (src/tscan.cxx:1134-1181).  Class names follow Conn::Type (conn.h:9-11):
# TEMPOREEL, OPSOMMEND_WG (word-group enumerating), OPSOMMEND_ZIN
# (sentence enumerating — a VZ-tagged member here, like the reference's
# preposition-class connectives), CONTRASTIEF, COMPARATIEF, CAUSAAL.
CONNECTIVES = {
    "value": "CAUSAAL",
    "vector": "TEMPOREEL",
    "window": "CONTRASTIEF",
    "small": "COMPARATIEF",
    "spark": "OPSOMMEND_WG",
    "filter": "OPSOMMEND_ZIN",
}
CONNECTIVE_TAGS = ["VG", "VZ", "BW"]

# W9 situation lexicon (lemma -> class), Situation::Type (situation.h:8-10)
SITUATIONS = {
    "data": "TIME",
    "row": "SPACE",
    "join": "EMOTION",
    "merge": "CAUSE",
}

# W12 intensifiers (src/tscan.cxx:1467-1488)
INTENSIFIERS = ["big", "fast"]

# W13 formal words (src/tscan.cxx:1491-1507)
FORMAL_WORDS = ["query", "column"]

CONTENT_TAGS = ["N", "WW", "ADJ", "BW"]  # W23 content: head verb/BW/N/ADJ/name


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def tag_expr(word: Column) -> Column:
    """CGN head tag from first letter (portable CASE cascade)."""
    first = F.substring(word, 1, 1)
    expr = F.lit("SPEC")
    for lo, hi, tag in reversed(TAG_BANDS):
        expr = F.when((first >= lo) & (first <= hi), tag).otherwise(expr)
    return expr


def lemma_expr(word: Column) -> Column:
    return F.when(
        (F.length(word) >= LEMMA_MIN_LEN) & word.endswith("s"),
        F.substr(word, F.lit(1), F.length(word) - 1),
    ).otherwise(word)


def lexicon_df(spark: SparkSession, mapping: dict[str, str], key: str, val: str) -> DataFrame:
    """A lexicon as a small dimension DataFrame — broadcast-joined
    (reference loads these as in-RAM std::maps, src/tscan.cxx:862-1119;
    the Spark-native equivalent is a broadcast hash join)."""
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(mapping.items())], schema=f"{key} string, {val} string"
    )


def _sql_str(s: str) -> str:
    """Escape a literal for embedding in a Spark SQL string."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def lexicon_map(mapping: dict[str, str], key: Column) -> Column:
    """Closed-class lexicon as a literal map lookup.

    For compile-time-constant lexicons (connectives, situations — tens of
    entries) a literal map lookup constant-folds into whole-stage
    codegen: zero exchanges, zero broadcast setup. Corpus-derived
    lexicons (word_freq) stay broadcast *joins* since they are data,
    not constants. The map literal is built as ONE parsed SQL
    expression: the former per-entry F.lit() construction cost 2 py4j
    round trips per entry across ~50 call sites, a measured driver-side
    construction hotspot of every annotation-ladder query (guide §5)."""
    entries = ", ".join(
        f"'{_sql_str(k)}', '{_sql_str(v)}'" for k, v in sorted(mapping.items())
    )
    return F.element_at(F.expr(f"map({entries})"), key)


def annotate(tok: DataFrame) -> DataFrame:
    """tokens_long -> fully annotated token grain.

    All features are native column expressions — a single whole-stage-
    codegen span over the scan, no exchanges (the closed-class lexicons
    fold in as literal maps; the corpus-derived frequency lexicon joins
    later in pipeline.word_features as a broadcast join).
    """
    # two select stages, not a withColumn chain: every withColumn is a
    # fresh Project node the analyzer re-resolves over all columns, and
    # the profile's wide plans made that resolution the dominant cost.
    # Expression lists are built once per process (_annot_stage1/2):
    # they are unresolved Column trees over module constants only, and
    # rebuilding them per call was pure py4j round-trip cost (guide §5).
    return tok.select("*", *_annot_stage1()).select("*", *_annot_stage2())


@lru_cache(maxsize=None)
def _annot_stage1() -> tuple:
    w = F.col("word")
    return (
        F.lower(w).alias("l_word"),
        F.length(w).alias("char_cnt"),
        tag_expr(w).alias("tag"),
        lemma_expr(w).alias("lemma"),
    )


@lru_cache(maxsize=None)
def _annot_stage2() -> tuple:
    return (
        F.col("tag").isin(CONTENT_TAGS).cast("int").alias("is_content"),
        F.col("l_word").isin(NEG_WORDS).cast("int").alias("is_neg"),
        F.col("lemma").isin(STOP_LEMMATA).cast("int").alias("is_stop"),
        F.col("lemma").isin(INTENSIFIERS).cast("int").alias("is_intens"),
        # W13 checkFormal (tscan.cxx:1491-1507): findInflected on the
        # lemma (the full_lemma pass has no compound-lemma analog here)
        inflected_lookup(FORMAL_MAP, F.col("lemma")).isNotNull().cast("int").alias(
            "is_formal"
        ),
        F.when(
            F.col("tag").isin(CONNECTIVE_TAGS),
            lexicon_map(CONNECTIVES, F.col("lemma")),
        ).alias("conn_type"),
        lexicon_map(SITUATIONS, F.col("lemma")).alias("sit_type"),
    )


# ---------------------------------------------------------------------------
# SQL oracle side — same rules as literals
# ---------------------------------------------------------------------------


def _sql_in(col: str, values: list[str]) -> str:
    lits = ", ".join(f"'{v}'" for v in values)
    return f"{col} IN ({lits})"


def sql_tag(col: str = "word") -> str:
    cases = "\n        ".join(
        f"WHEN substring({col}, 1, 1) BETWEEN '{lo}' AND '{hi}' THEN '{tag}'"
        for lo, hi, tag in TAG_BANDS
    )
    return f"CASE {cases} ELSE 'SPEC' END"


def sql_lemma(col: str = "word") -> str:
    return (
        f"CASE WHEN length({col}) >= {LEMMA_MIN_LEN} AND {col} LIKE '%s' "
        f"THEN substring({col}, 1, length({col}) - 1) ELSE {col} END"
    )


def sql_case_map(col: str, mapping: dict[str, str]) -> str:
    cases = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in sorted(mapping.items()))
    return f"CASE {col} {cases} END"


def sql_annot_cte() -> str:
    """Render the annotated-token CTE (depends on `tok` CTE)."""
    return f"""
annot0 AS (
    SELECT tok.*,
           lower(word) AS l_word,
           length(word) AS char_cnt,
           {sql_tag("word")} AS tag,
           {sql_lemma("word")} AS lemma
    FROM tok
),
annot AS (
    SELECT annot0.*,
           CASE WHEN {_sql_in("tag", CONTENT_TAGS)} THEN 1 ELSE 0 END AS is_content,
           CASE WHEN {_sql_in("l_word", NEG_WORDS)} THEN 1 ELSE 0 END AS is_neg,
           CASE WHEN {_sql_in("lemma", STOP_LEMMATA)} THEN 1 ELSE 0 END AS is_stop,
           CASE WHEN {_sql_in("lemma", INTENSIFIERS)} THEN 1 ELSE 0 END AS is_intens,
           CASE WHEN {sql_inflected_lookup(FORMAL_MAP, "lemma")} IS NOT NULL
                THEN 1 ELSE 0 END AS is_formal,
           CASE WHEN {_sql_in("tag", CONNECTIVE_TAGS)}
                THEN {sql_case_map("lemma", CONNECTIVES)} END AS conn_type,
           {sql_case_map("lemma", SITUATIONS)} AS sit_type
    FROM annot0
)"""


# ---------------------------------------------------------------------------
# Extended classifier battery (W4, W7, W10-W16, W24-W26)
# ---------------------------------------------------------------------------

# W7 checkMorphNeg (src/wordstats.cxx:288-305): morphological negation by
# prefix list; synthetic prefixes over this vocabulary.
MORPH_NEG_PREFIXES = ["ba", "fi"]

# W10/W11 noun/name semantic types (fillN src/tscan.cxx:223-262,
# checkNoun 1337-1396): lemma -> semantic class; SEM::Type analog.
NOUN_SEM = {
    "data": "CONCRETE",
    "batch": "ABSTRACT",
    "column": "HUMAN",
    "customer": "HUMAN",
    "agg": "CONCRETE",
    "filter": "ABSTRACT",
    "dup": "CONCRETE",
}

# W15 adverb types (fill_adverbs src/tscan.cxx:406-443); MANNER adverbs
# are the *strict* content words (Adverb::isContent src/adverb.cxx:307-309)
ADVERB_TYPES = {
    "scan": "GENERAL",
    "slow": "MANNER",
    "small": "MANNER",
    "sort": "GENERAL",
    "spark": "MANNER",
    "stream": "GENERAL",
}

# W16 abbreviations (fill afk src/tscan.cxx:650-705): word -> domain
AFK_DOMAINS = {"a": "OVERIG", "agg": "TECH", "dup": "TECH"}

# W24 checkNominal (src/wordstats.cxx:61-138) — the FULL rule:
# (1) N-tagged with >1 morphemes: final morpheme, after stripping a
#     plural morpheme en/s/n (exact reference strip list), in the
#     nominal-suffix morpheme set (analog of ing/sel/nis/heid/...);
# (2) same branch, when that morpheme is longer than 4 chars: tail match
#     against NOMINAL_TAILS (analog of ose/ase/ese/isme/sie/tie);
# (3) single-morpheme words longer than 4 chars: word tail match against
#     NOMINAL_TAILS (any tag — the reference checks this outside the N
#     branch);
# (4) the Alpino verb-under-NP variant — needs parse nodes, computed in
#     operators/parse.py::nominalization alongside this lexical rule.
NOMINAL_MORPH_SUFFIXES = ["mer", "tch", "ba"]
NOMINAL_PLURAL_MORPHS = ["en", "s", "n"]
NOMINAL_TAILS = ["ue", "er"]

# W25 compounds: length >= threshold splits into head + 3-char satellite
# (compound info from fillN; formForHead src/tscan.cxx:1260-1296)
COMPOUND_MIN_LEN = 6
COMPOUND_SAT_LEN = 3


# W5/W7 morpheme split (longest-analysis pick, tscan.cxx:1726-1757):
# [prefix, rest] for morph-neg prefixed words; [head, sat] for N-tagged
# compounds; else [word]. Single source of truth for the vocab dimension
# (vocab_dim.build_vocab_dim) AND the W24 morpheme arms below.
def morphemes_expr(word: Column, tag: Column) -> Column:
    prefix_arms = None
    for p in MORPH_NEG_PREFIXES:
        cond = word.startswith(p) & (F.length(word) > len(p))
        arm = F.array(F.lit(p), F.substr(word, F.lit(len(p) + 1), F.length(word)))
        prefix_arms = (
            F.when(cond, arm) if prefix_arms is None else prefix_arms.when(cond, arm)
        )
    is_comp = (tag == "N") & (F.length(word) >= COMPOUND_MIN_LEN)
    comp = F.array(
        F.substr(word, F.lit(1), F.length(word) - COMPOUND_SAT_LEN),
        F.substr(
            word,
            F.length(word) - F.lit(COMPOUND_SAT_LEN - 1),
            F.lit(COMPOUND_SAT_LEN),
        ),
    )
    return prefix_arms.when(is_comp, comp).otherwise(F.array(word))


def sql_morphemes(col: str, tag_sql: str) -> str:
    arms = []
    for p in MORPH_NEG_PREFIXES:
        arms.append(
            f"WHEN {col} LIKE '{p}%' AND length({col}) > {len(p)} "
            f"THEN ['{p}', substring({col}, {len(p) + 1})]"
        )
    arms.append(
        f"WHEN ({tag_sql}) = 'N' AND length({col}) >= {COMPOUND_MIN_LEN} "
        f"THEN [substring({col}, 1, length({col}) - {COMPOUND_SAT_LEN}), "
        f"substring({col}, length({col}) - {COMPOUND_SAT_LEN - 1})]"
    )
    return "CASE " + " ".join(arms) + f" ELSE [{col}] END"


def nominal_lexical_expr(word: Column, tag: Column) -> Column:
    """checkNominal branches 1-3 (the parse-free arms) as codegen CASE
    logic over the morpheme array."""
    morphs = morphemes_expr(word, tag)
    nm = F.size(morphs)
    last = F.element_at(morphs, -1)
    # plural strip: nm > 1 guard keeps element_at(-2) in bounds (ANSI)
    eff_last = F.when(
        (nm > 1) & last.isin(NOMINAL_PLURAL_MORPHS), F.element_at(morphs, -2)
    ).otherwise(last)

    def tail_match(c: Column) -> Column:
        hit = F.lit(False)
        for t in NOMINAL_TAILS:
            hit = hit | c.endswith(t)
        return hit

    branch_morph = (
        (tag == "N")
        & (nm > 1)
        & (
            eff_last.isin(NOMINAL_MORPH_SUFFIXES)
            | ((F.length(eff_last) > 4) & tail_match(eff_last))
        )
    )
    branch_tail = (nm < 2) & (F.length(word) > 4) & tail_match(word)
    return branch_morph | branch_tail


def sql_nominal_lexical(col: str, tag_sql: str) -> str:
    morphs = sql_morphemes(col, tag_sql)
    suffixes = ", ".join(f"'{s}'" for s in NOMINAL_MORPH_SUFFIXES)
    plurals = ", ".join(f"'{s}'" for s in NOMINAL_PLURAL_MORPHS)

    def tails(c: str) -> str:
        return " OR ".join(f"{c} LIKE '%{t}'" for t in NOMINAL_TAILS)

    eff = (
        f"CASE WHEN len({morphs}) > 1 AND ({morphs})[-1] IN ({plurals}) "
        f"THEN ({morphs})[-2] ELSE ({morphs})[-1] END"
    )
    return (
        f"(({tag_sql}) = 'N' AND len({morphs}) > 1 AND "
        f"(({eff}) IN ({suffixes}) OR (length({eff}) > 4 AND ({tails(f'({eff})')}))))"
        f" OR (len({morphs}) < 2 AND length({col}) > 4 AND ({tails(col)}))"
    )


def nouns_dim_lookup(tok_annotated: "DataFrame", nouns_dim: "DataFrame") -> "DataFrame":
    """The findInflected cascade (utils.h:32-55) against a FILE-loaded
    nouns dimension (fillN format, sources/lexicon_files.py) as a
    broadcast join — the scale path when the lexicon is too big to
    constant-fold into literal CASE maps.

    Each N/ADJ token emits its priority-ordered candidate keys (lemma
    exact, lemma per-suffix variant, then the word form's cascade —
    same order as :func:`inflected_lookup`), the candidates broadcast-
    join the dimension, and ``min_by(prio)`` keeps the first hit —
    exactly the reference's cascade, one broadcast hash join at corpus
    scale. Adds ``_file_sem/_file_is_comp/_file_head/_file_sat``.
    """

    def cascade_keys(col) -> list:
        ks = [col]
        for s in INFLECTION_SUFFIXES:
            stripped = F.substr(col, F.lit(1), F.length(col) - len(s))
            ks.append(
                F.when((F.length(col) > len(s)) & col.endswith(s), stripped).otherwise(
                    F.concat(col, F.lit(s))
                )
            )
        return ks

    keys = cascade_keys(F.col("lemma")) + cascade_keys(F.col("word"))
    cand = tok_annotated.where(F.col("tag").isin(["N", "ADJ"])).select(
        "doc_id",
        "word_idx",
        F.posexplode(F.array(*keys)).alias("_prio", "_nkey"),
    )
    dim = nouns_dim.select(
        F.col("word").alias("_nkey"),
        F.col("sem_class").alias("_f_sem"),
        F.col("is_compound").alias("_f_comp"),
        F.col("comp_head").alias("_f_head"),
        F.col("comp_sat").alias("_f_sat"),
    )
    hit = (
        cand.join(F.broadcast(dim), "_nkey")
        .groupBy("doc_id", "word_idx")
        .agg(
            F.min_by(
                F.struct("_f_sem", "_f_comp", "_f_head", "_f_sat"), F.col("_prio")
            ).alias("_hit")
        )
    )
    return (
        tok_annotated.join(hit, ["doc_id", "word_idx"], "left")
        .select(
            "*",
            F.col("_hit._f_sem").alias("_file_sem"),
            F.col("_hit._f_comp").alias("_file_is_comp"),
            F.col("_hit._f_head").alias("_file_head"),
            F.col("_hit._f_sat").alias("_file_sat"),
        )
        .drop("_hit")
    )


def annotate_extended(
    tok_annotated: "DataFrame", nouns_dim: "DataFrame | None" = None
) -> "DataFrame":
    """Extended per-word classifiers on top of :func:`annotate`.

    Adds: morph negation (W7), noun semantic type w/ word fallback
    (W10/W11 inflection-cascade analog), adverb type + strict-content
    flag (W15/W23 strict), abbreviation domain (W16), nominalization
    (W24), compound split + char counts (W25), personal reference (W26),
    synthetic CGN props (W4: verb form for WW, pronoun person for VNW,
    adjective position for ADJ).

    ``nouns_dim``: a fillN-format nouns dimension
    (sources/lexicon_files.load_nouns_semtype). When given, the W10/W11
    semantic classification and the W25 compound split come from the
    FILE (explicit head/satellite columns, reference fillN
    tscan.cxx:223-262) via the broadcast cascade of
    :func:`nouns_dim_lookup` instead of the synthetic-analog literal
    maps; every downstream flag (sem_unfound, strict content, personal
    reference, fan-out counters) derives identically from the result.

    Two select stages (see annotate); the default-branch expression
    lists are process-cached (_annot_ext_stage1/2) — pure constant
    Column trees whose per-call rebuild was py4j round-trip cost.
    """
    w, tag = F.col("word"), F.col("tag")
    if nouns_dim is not None:
        tok_annotated = nouns_dim_lookup(tok_annotated, nouns_dim)
        sem_expr = F.when(tag.isin(["N", "ADJ"]), F.col("_file_sem"))
        # W25 from the file: explicit compound flag + head/satellite
        # (null-safe: a lookup miss is NOT-a-compound, not NULL)
        is_comp = (tag == "N") & (F.coalesce(F.col("_file_is_comp"), F.lit(0)) == 1)
        comp_head = F.when(is_comp, F.col("_file_head"))
        comp_head_len = F.when(is_comp, F.length("_file_head"))
        out = tok_annotated.select(
            "*",
            *_annot_ext_shared_pre(),
            sem_expr.alias("noun_sem"),
            *_annot_ext_shared_mid(),
            is_comp.cast("int").alias("is_compound"),
            comp_head.alias("comp_head"),
            comp_head_len.alias("comp_head_len"),
            *_annot_ext_shared_post(),
        )
        # the file's explicit satellite (analog mode derives comp_sat by
        # the char-split rule later, in pipeline_ratios._word_grain)
        out = out.withColumn(
            "comp_sat",
            F.when(F.col("is_compound") == 1, F.col("_file_sat")),
        ).drop("_file_sem", "_file_is_comp", "_file_head", "_file_sat")
    else:
        out = tok_annotated.select("*", *_annot_ext_stage1())
    return out.select("*", *_annot_ext_stage2())


@lru_cache(maxsize=None)
def _annot_ext_shared_pre() -> tuple:
    """Stage-1 columns shared by both branches, BEFORE noun_sem."""
    w, tag = F.col("word"), F.col("tag")
    # W7: prefix morphological negation
    morph_neg = F.lit(False)
    for p in MORPH_NEG_PREFIXES:
        morph_neg = morph_neg | w.startswith(p)
    return (morph_neg.cast("int").alias("is_morph_neg"),)


@lru_cache(maxsize=None)
def _annot_ext_shared_mid() -> tuple:
    """Stage-1 columns shared by both branches, between noun_sem and
    the compound block (order preserved exactly)."""
    w, tag = F.col("word"), F.col("tag")
    # W24: full lexical nominalization rule (morpheme + tail branches;
    # the verb-under-NP parse branch lives in operators/parse.py)
    nominal = nominal_lexical_expr(w, tag)
    return (
        # W15: adverb type
        F.when(tag == "BW", lexicon_map(ADVERB_TYPES, w)).alias("adverb_type"),
        # W16: abbreviation domain (N/SPEC gate like checkAfk)
        F.when(tag.isin(["N", "SPEC"]), lexicon_map(AFK_DOMAINS, w)).alias("afk_domain"),
        nominal.cast("int").alias("is_nominal"),
    )


@lru_cache(maxsize=None)
def _annot_ext_shared_post() -> tuple:
    """Stage-1 trailing columns shared by both branches (W4 props)."""
    w, tag = F.col("word"), F.col("tag")
    return (
        F.when(
            tag == "WW", F.when(F.length(w) % 2 == 0, "pv").otherwise("inf")
        ).alias("verb_form"),
        F.when(tag == "VNW", (F.length(w) % 3 + 1).cast("int")).alias("pron_person"),
        F.when(
            tag == "ADJ",
            F.when(F.substring(w, 1, 1) <= "p", "prenom").otherwise("vrij"),
        ).alias("adj_pos"),
    )


@lru_cache(maxsize=None)
def _annot_ext_stage1() -> tuple:
    """Default-branch stage-1 list (synthetic-analog lexicons)."""
    w, lem, tag = F.col("word"), F.col("lemma"), F.col("tag")
    # W10/W11: semantic type via the findInflected cascade — lemma
    # first (checkNoun tscan.cxx:1342), then the word form (checkAdj
    # tscan.cxx:1411-1415 tries l_lemma then l_word), each with the
    # ±e/en/s suffix fallback (utils.h:32-55)
    sem_expr = F.when(
        tag.isin(["N", "ADJ"]),
        F.coalesce(inflected_lookup(NOUN_SEM, lem), inflected_lookup(NOUN_SEM, w)),
    )
    # W25: compound split (head = all but last 3 chars, sat = last 3)
    is_comp = (tag == "N") & (F.length(w) >= COMPOUND_MIN_LEN)
    comp_head = F.when(is_comp, F.substr(w, F.lit(1), F.length(w) - COMPOUND_SAT_LEN))
    comp_head_len = F.when(is_comp, F.length(w) - COMPOUND_SAT_LEN)
    return (
        *_annot_ext_shared_pre(),
        sem_expr.alias("noun_sem"),
        *_annot_ext_shared_mid(),
        is_comp.cast("int").alias("is_compound"),
        comp_head.alias("comp_head"),
        comp_head_len.alias("comp_head_len"),
        *_annot_ext_shared_post(),
    )


@lru_cache(maxsize=None)
def _annot_ext_stage2() -> tuple:
    tag = F.col("tag")
    return (
        # UNFOUND_NOUN (checkNoun tscan.cxx:1385-1393): an N-tagged word
        # with no semantic type — the S10 problems.log trigger
        ((tag == "N") & F.col("noun_sem").isNull()).cast("int").alias("sem_unfound"),
        # strict content = content minus non-MANNER adverbs (W15/W23)
        F.coalesce(
            (
                (F.col("is_content") == 1)
                & ((tag != "BW") | (F.col("adverb_type") == "MANNER"))
            ).cast("int"),
            F.lit(0),
        ).alias("is_content_strict"),
        # W26: personal reference = human noun or pronoun (null-safe: a
        # NULL noun_sem must yield 0, not NULL — an all-NULL doc would
        # make the count aggregate NULL instead of 0)
        F.coalesce(
            ((F.col("noun_sem") == "HUMAN") | (tag == "VNW")).cast("int"), F.lit(0)
        ).alias("is_pers_ref"),
    )


def sql_annot_ext_cte() -> str:
    """Oracle CTE for the extended battery (depends on `annot`)."""
    morph = " OR ".join(f"word LIKE '{p}%'" for p in MORPH_NEG_PREFIXES)
    nominal = sql_nominal_lexical("word", "tag")
    noun_sem_sql = (
        "CASE WHEN tag IN ('N', 'ADJ') THEN "
        f"COALESCE({sql_inflected_lookup(NOUN_SEM, 'lemma')}, "
        f"{sql_inflected_lookup(NOUN_SEM, 'word')}) END"
    )
    return f"""
annot_ext AS (
    SELECT annot.*,
           CASE WHEN {morph} THEN 1 ELSE 0 END AS is_morph_neg,
           {noun_sem_sql} AS noun_sem,
           CASE WHEN tag = 'N' AND ({noun_sem_sql}) IS NULL
                THEN 1 ELSE 0 END AS sem_unfound,
           CASE WHEN tag = 'BW' THEN {sql_case_map("word", ADVERB_TYPES)} END
               AS adverb_type,
           CASE WHEN is_content = 1 AND (tag <> 'BW' OR
                     (CASE WHEN tag = 'BW' THEN {sql_case_map("word", ADVERB_TYPES)} END)
                     = 'MANNER')
                THEN 1 ELSE 0 END AS is_content_strict,
           CASE WHEN tag IN ('N', 'SPEC') THEN {sql_case_map("word", AFK_DOMAINS)} END
               AS afk_domain,
           CASE WHEN {nominal} THEN 1 ELSE 0 END AS is_nominal,
           CASE WHEN tag = 'N' AND length(word) >= {COMPOUND_MIN_LEN} THEN 1 ELSE 0 END
               AS is_compound,
           CASE WHEN tag = 'N' AND length(word) >= {COMPOUND_MIN_LEN}
                THEN substring(word, 1, length(word) - {COMPOUND_SAT_LEN}) END
               AS comp_head,
           CASE WHEN tag = 'N' AND length(word) >= {COMPOUND_MIN_LEN}
                THEN length(word) - {COMPOUND_SAT_LEN} END AS comp_head_len,
           CASE WHEN ({noun_sem_sql}) = 'HUMAN'
                     OR tag = 'VNW' THEN 1 ELSE 0 END AS is_pers_ref,
           CASE WHEN tag = 'WW' THEN
                CASE WHEN length(word) % 2 = 0 THEN 'pv' ELSE 'inf' END END AS verb_form,
           CASE WHEN tag = 'VNW' THEN CAST(length(word) % 3 + 1 AS INT) END
               AS pron_person,
           CASE WHEN tag = 'ADJ' THEN
                CASE WHEN substring(word, 1, 1) <= 'p' THEN 'prenom' ELSE 'vrij' END END
               AS adj_pos
    FROM annot
)"""


# ---------------------------------------------------------------------------
# Pronoun equivalence classes for argument overlap (L1/L2)
# ---------------------------------------------------------------------------

# The reference's argument_overlap (/root/reference/src/utils.cxx:24-90)
# counts a candidate as overlapping when it string-equals a buffer entry
# OR both belong to the same pronoun equivalence class (7 classes:
# 1s/2s/3sm/3sf/1p/2p/3p; membership OVERLAPS — "zij"/"ze" sit in both
# 3sf and 3p).  Synthetic analog over this vocabulary, with the same
# shape: 7 classes, one word ("data") deliberately in two classes.
PRONOUN_CLASSES = [
    ("p1s", ["key", "big"]),
    ("p2s", ["row", "line"]),
    ("p3sm", ["table", "column"]),
    ("p3sf", ["data", "batch"]),
    ("p1p", ["group", "part"]),
    ("p2p", ["join"]),
    ("p3p", ["data", "stream"]),
]

_PRONOUN_MARKERS: dict[str, list[str]] = {}
for _cls, _words in PRONOUN_CLASSES:
    for _w in _words:
        _PRONOUN_MARKERS.setdefault(_w, []).append("#" + _cls)


def overlap_keys_expr(col: Column) -> Column:
    """Match-key array for a word: [word, *class markers].

    Two words overlap-match iff their key arrays intersect — equality
    via the word key, pronoun equivalence via a shared class marker
    (markers start with '#', disjoint from surface words)."""
    entries = ", ".join(
        "'{w}', array({marks})".format(
            w=_sql_str(w),
            marks=", ".join(f"'{_sql_str(m)}'" for m in marks),
        )
        for w, marks in sorted(_PRONOUN_MARKERS.items())
    )
    markers = F.coalesce(F.element_at(F.expr(f"map({entries})"), col), F.array())
    return F.concat(F.array(col), markers)


def sql_overlap_keys(col: str) -> str:
    arms = " ".join(
        f"WHEN '{w}' THEN {marks!r}".replace('"', "'")
        for w, marks in sorted(_PRONOUN_MARKERS.items())
    )
    return f"list_prepend({col}, CASE {col} {arms} ELSE [] END)"


# ---------------------------------------------------------------------------
# findInflected lookup cascade (W10/W11/W13)
# ---------------------------------------------------------------------------

# /root/reference/include/tscan/utils.h:13 — the exact suffix list, in
# cascade order: exact match first, then per suffix: if the key ENDS
# with the suffix try it stripped, otherwise try it appended.
INFLECTION_SUFFIXES = ["e", "en", "s"]


def inflected_lookup(mapping: dict[str, str], col: Column) -> Column:
    """findInflected (utils.h:32-55) as a coalesce cascade of literal-map
    lookups — constant-folds into codegen, zero joins."""
    result = lexicon_map(mapping, col)
    for s in INFLECTION_SUFFIXES:
        stripped = F.substr(col, F.lit(1), F.length(col) - len(s))
        variant = F.when(
            (F.length(col) > len(s)) & col.endswith(s),
            lexicon_map(mapping, stripped),
        ).otherwise(lexicon_map(mapping, F.concat(col, F.lit(s))))
        result = F.coalesce(result, variant)
    return result


def sql_inflected_lookup(mapping: dict[str, str], col: str) -> str:
    parts = [sql_case_map(col, mapping)]
    for s in INFLECTION_SUFFIXES:
        stripped = f"substring({col}, 1, length({col}) - {len(s)})"
        appended = f"({col} || '{s}')"
        parts.append(
            f"CASE WHEN length({col}) > {len(s)} AND {col} LIKE '%{s}' "
            f"THEN {sql_case_map(stripped, mapping)} "
            f"ELSE {sql_case_map(appended, mapping)} END"
        )
    return "COALESCE(" + ", ".join(parts) + ")"


FORMAL_MAP = {w: "1" for w in FORMAL_WORDS}
