"""Event-time windowed operators (north-rule L4: lag/lead, gap-based
sessionization, backfill).

The reference has no event-time machinery (its only stream is a stdin
filename loop, /root/reference/src/tscan.cxx:3414-3492); these are the
north-rule generalizations built as pure Window plans over the `events`
table:

- sessionize: session boundary when the gap to the previous event of the
  same user exceeds a threshold; session id = running sum of boundary
  flags (one shuffle on user_id, then narrow).
- backfill:   last(value, ignorenulls) over an unbounded-preceding frame.
- lag/lead:   event-time deltas per user.

All timestamps are surfaced as epoch microseconds so results are
timezone-independent (Spark session tz vs DuckDB naive timestamps).

Ordering is (ts, event_id) — deterministic under duplicate timestamps.
Scale: every window partitions by user_id; skewed users are bounded by
AQE skew handling upstream and, for pathological keys, the salted
two-stage pattern (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import corpus

SESSION_GAP_MIN = 30


def _us(c) -> Column:
    """Epoch microseconds from a (possibly NTZ) timestamp column.

    Parquet naive timestamps load as TIMESTAMP_NTZ in Spark 4; the
    session timezone is pinned to UTC by session.tune(), so casting to
    TIMESTAMP yields the same instant DuckDB's epoch_us sees."""
    c = c if isinstance(c, Column) else F.col(c)
    return F.unix_micros(c.cast("timestamp"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.load(spark, sf_dir, "events")


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user -> one row per session."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = _us("ts") - _us(F.lag("ts").over(w))
    ev = ev.withColumn(
        "is_new",
        F.when(gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0),
    )
    ev = ev.withColumn(
        "session_id",
        F.sum("is_new").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    return ev.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(_us("ts")).alias("start_us"),
        F.max(_us("ts")).alias("end_us"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


SQL_SESSIONIZE = f"""
WITH g AS (
    SELECT *,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     > {SESSION_GAP_MIN} * 60 * 1000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT *,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM g
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(epoch_us(ts)) AS start_us,
       MAX(epoch_us(ts)) AS end_us,
       ROUND(SUM(value), 6) AS sum_value
FROM s
GROUP BY user_id, session_id"""


def backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill: 'error' events get the last prior non-error value."""
    ev = _events(spark, sf_dir)
    v = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        _us("ts").alias("ts_us"),
        "event_type",
        F.round(F.last(v, ignorenulls=True).over(w), 6).alias("value_filled"),
    )


SQL_BACKFILL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
       ROUND(last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING), 6) AS value_filled
FROM events"""


def lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag/lead values and inter-event gap in seconds."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        _us("ts").alias("ts_us"),
        F.round(F.lag("value").over(w), 6).alias("prev_value"),
        F.round(F.lead("value").over(w), 6).alias("next_value"),
        F.round(
            (_us("ts") - _us(F.lag("ts").over(w))) / 1e6, 6
        ).alias("gap_sec"),
    )


SQL_LAG_LEAD = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       ROUND(lag(value) OVER w, 6) AS prev_value,
       ROUND(lead(value) OVER w, 6) AS next_value,
       ROUND((epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1e6, 6) AS gap_sec
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""


# ---------------------------------------------------------------------------
# Rolling event-time range windows (L4 extension)
# ---------------------------------------------------------------------------
#
# Trailing-interval features per entity ("events/value in the last
# hour") via a RANGE frame over epoch-microsecond order — the
# batch counterpart of the streaming sliding window, and the feature
# shape online feature stores serve.  RANGE frames take a single
# numeric order key; timestamp peers aggregate together in both
# engines, so no tie-break is needed (or allowed).  Value sums use the
# fixed-point ladder so both engines add identical integers.

ROLL_INTERVAL_US = 3600 * 1_000_000  # one hour


def rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: count / sum / mean of `value` over the trailing hour
    for the same user.  Output: event_id, user_id, ts_us, n_1h, sum_1h,
    avg_1h."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id",
        "user_id",
        _us("ts").alias("ts_us"),
        F.round(F.col("value") * 1e6, 0).cast("long").alias("v_fp"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-ROLL_INTERVAL_US, 0)
    )
    cnt = F.count(F.lit(1)).over(w)
    sum_fp = F.sum("v_fp").over(w)
    return base.select(
        "event_id",
        "user_id",
        "ts_us",
        cnt.cast("long").alias("n_1h"),
        F.round(sum_fp / 1e6, 6).alias("sum_1h"),
        F.round(sum_fp / 1e6 / cnt, 6).alias("avg_1h"),
    )


SQL_ROLLING = f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       ROUND(SUM(CAST(round(value * 1e6, 0) AS BIGINT)) OVER w / 1e6, 6)
           AS sum_1h,
       ROUND(SUM(CAST(round(value * 1e6, 0) AS BIGINT)) OVER w / 1e6
             / COUNT(*) OVER w, 6) AS avg_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {ROLL_INTERVAL_US} PRECEDING AND CURRENT ROW)"""
