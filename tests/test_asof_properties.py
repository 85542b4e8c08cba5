"""Property tests for the as-of join family (operators/asof.py).

The three physical strategies (cogrouped merge_asof, broadcast max_by,
broadcast timeline array) must agree with each other AND with an
independent pure-Python backward-as-of reference on randomized
snapshot timelines: boundary ties (event_ts == valid_from is a match —
`<=`, never `<`), keys with no snapshot at all, events before every
snapshot, and interleaved version orders. The corpus-level agreement
test (test_operators.py) exercises one fixed timeline shape; these
cover the semantic edges the DuckDB ASOF oracle can't randomize.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

KEYS = ["alpha", "beta", "gamma"]

# (key, day, value): unique (key, day) — one snapshot per key per
# timestamp, the versioned-dimension invariant lexicon_snapshots holds
SNAPS = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 30), st.integers(0, 99)),
    min_size=0,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),
)
# (key, day): keys include one never present in any snapshot; days
# extend below 0 (before every snapshot) and past the last snapshot
FACTS = st.lists(
    st.tuples(st.sampled_from(KEYS + ["missing"]), st.integers(-5, 35)),
    min_size=1,
    max_size=16,
)


def _expected(snaps, facts):
    out = []
    for i, (key, day) in enumerate(facts):
        cands = [
            (d, ver, val)
            for ver, (k, d, val) in enumerate(snaps)
            if k == key and d <= day  # backward: <= boundary included
        ]
        if cands:
            d, ver, val = max(cands)
            out.append((i, key, ver, float(val)))
        else:
            out.append((i, key, None, None))
    return sorted(out)


@pytest.mark.parametrize("strategy", ["merge", "broadcast", "array"])
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(snaps=SNAPS, facts=FACTS)
def test_asof_strategy_matches_reference(spark, strategy, snaps, facts):
    from tscan_spark.operators import asof

    left = spark.createDataFrame(
        [(i, k, d) for i, (k, d) in enumerate(facts)],
        StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("word", StringType(), False),
                StructField("day", IntegerType(), False),
            ]
        ),
    ).select(
        "doc_id",
        "word",
        F.to_timestamp(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("day"))
        ).alias("event_ts"),
    )
    right = spark.createDataFrame(
        [(k, ver, d, float(val)) for ver, (k, d, val) in enumerate(snaps)],
        "word string, version int, day int, lex_value double",
    ).select(
        "word",
        "version",
        F.to_timestamp(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("day"))
        ).alias("valid_from"),
        "lex_value",
    )
    join = asof._ASOF_STRATEGIES[strategy]
    got = join(
        left, right, on="event_ts", right_on="valid_from", by=["word"],
        value_cols=["lex_value"],
    )
    rows = sorted(
        (r.doc_id, r.word, r.version, r.lex_value)
        for r in got.select("doc_id", "word", "version", "lex_value").collect()
    )
    assert rows == _expected(snaps, facts), strategy
