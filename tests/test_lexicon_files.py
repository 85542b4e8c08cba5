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
