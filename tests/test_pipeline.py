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
