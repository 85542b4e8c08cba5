"""Correctness of the tokenize -> annotate -> aggregate ladder vs DuckDB."""

from tests.conftest import SF_DIR, assert_matches_oracle
from tscan_spark import corpus, pipeline


def test_tokens_long_matches_oracle(spark, oracle):
    documents = corpus.load(spark, SF_DIR, "documents")
    df = corpus.tokens_long(documents)
    sql = f"WITH {corpus.SQL_TOK_CTE.strip()} SELECT * FROM tok"
    assert_matches_oracle(df, oracle, sql)


def test_docs_tokenized_shape(spark):
    documents = corpus.load(spark, SF_DIR, "documents")
    docs = corpus.docs_tokenized(documents)
    row = docs.first()
    assert row.n_tok == len(row.tokens)
    assert dict(docs.dtypes)["tokens"] == "array<int>"
    assert dict(docs.dtypes)["doc_id"] == "string"
    # token array reproducibility (exact-equality invariant)
    a = {r.doc_id: r.tokens for r in docs.collect()}
    b = {r.doc_id: r.tokens for r in corpus.docs_tokenized(documents).collect()}
    assert a == b


def test_doc_features_match_oracle(spark, oracle):
    df = pipeline.doc_features(spark, SF_DIR)
    assert_matches_oracle(df, oracle, pipeline.sql_doc_features())


def test_sentence_features_match_oracle(spark, oracle):
    df = pipeline.sentence_features(spark, SF_DIR).drop("sent_wfl", "wfl_fp")
    sql = (
        pipeline.sql_sentence_features()
        + " SELECT * EXCLUDE (wfl_fp) FROM sentf"
    )
    assert_matches_oracle(df, oracle, sql)


def test_doc_features_ext_match_oracle(spark, oracle):
    from tscan_spark import pipeline_ext

    df = pipeline_ext.doc_features_ext(spark, SF_DIR)
    assert_matches_oracle(df, oracle, pipeline_ext.sql_doc_features_ext())


def test_vocab_content_hash_ids_unique(spark):
    """Content-hash token ids must be collision-free over the corpus
    vocabulary (the hash replaced the global dense_rank; MTLD/fingerprint
    distinctness and token-array equality all ride on injectivity)."""
    from pyspark.sql import functions as F

    v = corpus.vocab(corpus.load(spark, SF_DIR, "documents"))
    row = v.agg(
        F.countDistinct("token_id").alias("ids"),
        F.countDistinct("word").alias("words"),
    ).first()
    assert row.ids == row.words


def test_docs_tokenized_scalar_witness_matches_array(spark):
    """The registered scalar witness (comma-joined ids) carries exactly
    the array invariant."""
    from tscan_spark.registry import QUERIES

    docs = corpus.docs_tokenized(corpus.load(spark, SF_DIR, "documents"))
    arr = {r.doc_id: list(r.tokens) for r in docs.collect()}
    scal = {
        r.doc_id: [int(x) for x in r.tokens_str.split(",")]
        for r in QUERIES["docs_tokenized"](spark, SF_DIR).collect()
    }
    assert arr == scal


def test_sentence_features_ext_match_oracle(spark, oracle):
    from tscan_spark.registry import ORACLES, QUERIES

    df = QUERIES["tscan_sentence_features_ext"](spark, SF_DIR)
    assert_matches_oracle(df, oracle, ORACLES["tscan_sentence_features_ext"])


def test_word_csv_match_oracle(spark, oracle):
    from tscan_spark.registry import ORACLES, QUERIES

    df = QUERIES["tscan_word_csv"](spark, SF_DIR)
    assert_matches_oracle(df, oracle, ORACLES["tscan_word_csv"])


def test_doc_profile_match_oracle(spark, oracle):
    from tscan_spark.registry import ORACLES, QUERIES

    df = QUERIES["tscan_doc_profile"](spark, SF_DIR)
    assert_matches_oracle(df, oracle, ORACLES["tscan_doc_profile"])
    # the profile is genuinely wide (structstats-style single row per doc)
    assert len(df.columns) >= 118
