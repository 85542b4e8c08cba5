"""S7 lexicon file-loader semantics (fill_freqlex / fill_topvals,
/root/reference/src/tscan.cxx:445-534)."""

from tscan_spark.sources.lexicon_files import parse_freqlex, parse_topvals


def test_freqlex_singleton_truncation():
    """Loading STOPS at the first count==1 row — the tail is dropped
    even if later rows have count > 1 (tscan.cxx:463-466)."""
    tsv = [
        "de\t100\tx\t10.0",
        "het\t50\tx\t25.0",
        "zeldzaam\t1\tx\t99.0",
        "nooit\t40\tx\t99.9",  # after the singleton: must NOT load
    ]
    rows, total = parse_freqlex(tsv)
    assert [r[0] for r in rows] == ["de", "het"]
    assert total == 150


def test_freqlex_freq_clip():
    """freq_clip > 0 stops at the first cum_freq above the clip
    (tscan.cxx:467-471)."""
    tsv = [
        "de\t100\tx\t10.0",
        "het\t50\tx\t25.0",
        "een\t30\tx\t80.0",
        "dat\t20\tx\t90.0",
    ]
    rows, total = parse_freqlex(tsv, freq_clip=50.0)
    assert [r[0] for r in rows] == ["de", "het"]
    assert total == 150


def test_freqlex_skips_malformed_and_blank():
    tsv = ["", "bad line", "de\t100\tx\t10.0", "  "]
    rows, total = parse_freqlex(tsv)
    assert rows == [("de", 100, 10.0)] and total == 100


def test_topvals_line_number_bands():
    """Band = 1-based line number thresholds (tscan.cxx:497-516)."""
    tsv = [f"w{i}\t{i}\tx\ty" for i in range(1, 12001)]
    rows = parse_topvals(tsv)
    bands = dict(rows)
    assert bands["w1"] == "top1000"
    assert bands["w1000"] == "top1000"
    assert bands["w1001"] == "top2000"
    assert bands["w2500"] == "top3000"
    assert bands["w4000"] == "top5000"
    assert bands["w9999"] == "top10000"
    assert bands["w12000"] == "top20000"


def test_load_freqlex_dataframe(spark):
    from tscan_spark.sources.lexicon_files import load_freqlex

    df = load_freqlex(
        spark, "de\t100\tx\t10.0\nhet\t50\tx\t25.0\nx\t1\tx\t99.0\n", is_text=True
    )
    rows = {r.word: r for r in df.collect()}
    assert set(rows) == {"de", "het"}
    # freq_log derived from the TRUNCATED total (150), not the file total
    import math

    assert abs(rows["de"].freq_log - math.log10(101 / 150 * 1e9)) < 1e-9


def test_parse_prevalences():
    from tscan_spark.sources.lexicon_files import parse_prevalences

    lines = [
        "# comment",
        "",
        "hond x 99.5 1.25 a b",
        "malformed line",
        "kat x 88.0 -0.5 a b",
    ]
    rows = parse_prevalences(lines)
    assert rows == [("hond", 99.5, 1.25), ("kat", 88.0, -0.5)]


def test_prevalence_features_match_oracle(spark, oracle):
    from tscan_spark.registry import ORACLES, QUERIES
    from tests.conftest import SF_DIR, assert_matches_oracle

    df = QUERIES["prevalence_features"](spark, SF_DIR)
    assert_matches_oracle(df, oracle, ORACLES["prevalence_features"])


def test_parse_nouns_semtype_arity_and_classification():
    """fillN (tscan.cxx:223-262): 3- or 6-column rows only; semtype via
    SEM::classifyNoun; compound head/satellite/parts only when the
    compound flag is '1'."""
    from tscan_spark.sources.lexicon_files import parse_nouns_semtype

    lines = [
        "hond\tnonhuman\t0",
        "arbeider\thuman\t0",
        "idee\tnondynamic\t0",
        "hondenhok\tartefact\t1\thok\thond\t2",
        "four\tcols\tbad\tline",  # 4 values -> skipped
        "",
        "raar\tnot_a_type\t0",  # unknown semtype -> UNFOUND (None)
        "tijd\ttime\t0",
        "vaag\tundefined\t0",  # UNDEFINED: loaded, no class
    ]
    rows = {r[0]: r for r in parse_nouns_semtype(lines)}
    assert set(rows) == {"hond", "arbeider", "idee", "hondenhok", "raar", "tijd", "vaag"}
    assert rows["hond"][2] == "CONCRETE" and rows["hond"][3] == 0
    assert rows["arbeider"][2] == "HUMAN"
    assert rows["idee"][2] == "ABSTRACT"
    assert rows["tijd"][2] == "CONCRETE"  # BROAD_CONCRETE_TIME analog
    assert rows["raar"][2] is None and rows["vaag"][2] is None
    _, _, cls, is_comp, head, sat, n = rows["hondenhok"]
    assert (cls, is_comp, head, sat, n) == ("CONCRETE", 1, "hok", "hond", 2)


def test_nouns_semtype_ladder_end_to_end(spark):
    """End-to-end W10/W25 over a REFERENCE-FORMAT nouns file: the
    fillN-loaded dimension flows through annotate_extended's broadcast
    findInflected cascade, verified against an independent PYTHON replay
    of the reference semantics (fillN tscan.cxx:223-262 + findInflected
    utils.h:32-55: lemma cascade first, then the word form; compound
    head/satellite come from the FOUND ENTRY — lemma-first, like
    checkNoun — not from a surface char-split)."""
    from pyspark.sql import functions as F

    from tscan_spark import annotate, corpus
    from tscan_spark.sources.lexicon_files import load_nouns_semtype
    from tests.conftest import SF_DIR

    base = annotate.annotate(corpus.tokens_long(corpus.load(spark, SF_DIR, "documents")))
    analog = annotate.annotate_extended(base)

    # render a fillN file over the corpus vocabulary: NOUN_SEM keys as
    # non/compound rows (compound info from the analog split rule) plus
    # every analog-compound vocab word with explicit head/satellite
    inv = {"CONCRETE": "concrother", "ABSTRACT": "nondynamic", "HUMAN": "human"}
    vocab = (
        analog.where(F.col("tag").isin(["N", "ADJ"]))
        .select("word", "is_compound", "comp_head", "noun_sem")
        .distinct()
        .collect()
    )
    comp_info = {r.word: r for r in vocab if r.is_compound == 1}
    lines, emitted = [], set()
    for key, cls in annotate.NOUN_SEM.items():
        c = comp_info.get(key)
        if c is not None:
            lines.append(
                f"{key}\t{inv[cls]}\t1\t{c.comp_head}\t{key[len(c.comp_head):]}\t2"
            )
        else:
            lines.append(f"{key}\t{inv[cls]}\t0")
        emitted.add(key)
    for w, c in comp_info.items():
        if w not in emitted:
            sem = inv.get(c.noun_sem, "undefined")
            lines.append(f"{w}\t{sem}\t1\t{c.comp_head}\t{w[len(c.comp_head):]}\t2")
    dim = load_nouns_semtype(spark, "\n".join(lines) + "\n", is_text=True)

    # independent Python replay of fillN + the findInflected cascade
    fdict = {}
    for r in dim.collect():
        fdict[r.word] = (r.sem_class, r.is_compound, r.comp_head, r.comp_sat)

    def cascade(key):
        cands = [key]
        for s in ("e", "en", "s"):
            cands.append(
                key[: -len(s)] if len(key) > len(s) and key.endswith(s) else key + s
            )
        return cands

    def replay(lemma, word):
        for k in cascade(lemma) + cascade(word):
            if k in fdict:
                return fdict[k]
        return None

    via_file = annotate.annotate_extended(base, nouns_dim=dim)
    rows = via_file.select(
        "doc_id", "word_idx", "word", "lemma", "tag",
        "noun_sem", "is_compound", "comp_head", "comp_sat",
    ).collect()
    assert rows
    n_sem = n_comp = 0
    for r in rows:
        if r.tag not in ("N", "ADJ"):
            assert r.noun_sem is None and r.is_compound == 0
            continue
        hit = replay(r.lemma, r.word)
        exp_sem = hit[0] if hit else None
        assert r.noun_sem == exp_sem, (r.word, r.lemma, r.noun_sem, hit)
        exp_comp = 1 if (r.tag == "N" and hit and hit[1] == 1) else 0
        assert r.is_compound == exp_comp, (r.word, r.lemma, r.is_compound, hit)
        if exp_comp:
            assert (r.comp_head, r.comp_sat) == (hit[2], hit[3])
            n_comp += 1
        if exp_sem is not None:
            n_sem += 1
    # the file actually classified and split a meaningful share
    assert n_sem > 0 and n_comp > 0


def test_doc_features_ladder_over_reference_format_lexicon(spark):
    """End-to-end: the doc-features ladder consuming a REFERENCE-FORMAT
    freqlex file (fill_freqlex semantics) instead of the corpus-derived
    lexicon. A file whose rows reproduce the corpus counts yields the
    exact same flagship output; a clipped file changes the frequency
    features (proving the truncated-total semantics actually flow
    through the ladder)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from tscan_spark import corpus, lexicons, pipeline
    from tests.conftest import SF_DIR

    documents = corpus.load(spark, SF_DIR, "documents")
    wf = lexicons.word_freq(documents).orderBy(F.desc("wf_count"), F.asc("word"))
    rows = wf.collect()
    total = sum(r.wf_count for r in rows)
    cum = 0.0
    lines = []
    for r in rows:
        cum += 100.0 * r.wf_count / total
        lines.append(f"{r.word}\t{r.wf_count}\tx\t{cum:.6f}")
    path = os.path.join(tempfile.mkdtemp(), "freqlex.tsv")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

    file_dim = lexicons.word_freq_from_file(spark, path)
    base = pipeline.doc_features(spark, SF_DIR).orderBy("doc_id").collect()
    via_file = (
        pipeline.doc_features(spark, SF_DIR, word_freq_dim=file_dim)
        .orderBy("doc_id")
        .collect()
    )
    assert [r.asDict() for r in base] == [r.asDict() for r in via_file]

    # clip at 50% cumulative frequency: the tail is truncated, the
    # freq-log total shrinks -> word_freq_log must differ somewhere
    clipped = lexicons.word_freq_from_file(spark, path, freq_clip=50.0)
    assert clipped.count() < len(rows)
    via_clip = (
        pipeline.doc_features(spark, SF_DIR, word_freq_dim=clipped)
        .orderBy("doc_id")
        .collect()
    )
    assert any(
        a.word_freq_log != b.word_freq_log for a, b in zip(base, via_clip)
    )
