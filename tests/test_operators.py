"""Window, temporal and as-of operators vs the DuckDB oracle."""

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle
from tscan_spark.registry import ORACLES, QUERIES

ORACLED = [
    "sentence_overlap",
    "doc_sliding_overlap",
    "sessionize_events",
    "backfill_events",
    "lag_lead_events",
    "asof_lexicon_features",
    "asof_lexicon_features_broadcast",
]


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, oracle, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, oracle, ORACLES[name])


def test_asof_no_temporal_leakage(spark):
    """A document dated before every snapshot must see NULL (never a
    future snapshot); max used version must respect event_ts."""
    from tscan_spark.operators import asof

    df = asof.asof_doc_features(spark, SF_DIR, strategy="broadcast")
    rows = {r.doc_id: r for r in df.collect()}
    for doc_id, r in rows.items():
        days = doc_id % 90
        if days < 9:  # before first snapshot (2024-01-10)
            assert r.matched_cnt == 0 and r.max_version is None, r
        elif days < 40:  # only snapshot 0 valid
            assert r.max_version in (None, 0), r
