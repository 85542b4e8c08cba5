"""Point-in-time (as-of) joins against versioned lexicon snapshots — the
north-rule core (SURVEY.md §2.4 J5).

The reference pins ONE lexicon version per run (settingData::init,
/root/reference/src/tscan.cxx:862-1119); the engine generalizes this to
versioned snapshot tables joined as-of each document's event time with
zero temporal leakage (strict backward direction: snapshot.valid_from <=
doc.event_ts, never a future snapshot).

Two physical strategies:

- :func:`asof_join` — generic sorted-partition merge: cogroup both sides
  on the `by` keys and run ``pd.merge_asof`` per group in Arrow batches.
  This is the scale path when the right side is large (many snapshots x
  many keys): shuffle is one hash exchange per side on the by-keys and
  the merge is O(n+m) per group.
- :func:`asof_join_broadcast` — when the snapshot dimension is small
  (the usual lexicon case): broadcast, range-filter, keep the max
  valid_from per left row via ``max_by``. No Python, no extra shuffle on
  the fact side beyond the final aggregate.

Both return the same schema; equivalence is pinned by tests and the
DuckDB ``ASOF LEFT JOIN`` oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from tscan_spark import corpus, lexicons
from tscan_spark.functions.scalars import sql_freq_log

SNAPSHOT_DATES = ["2024-01-10", "2024-02-10", "2024-03-10"]


def lexicon_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic versioned word_freq snapshots.

    Snapshot k is valid from SNAPSHOT_DATES[k]; it contains word w iff
    (length(w) + k) % 3 != 0 (so different words resolve to different
    versions for the same document — the per-key as-of path is real),
    with value = base freq_log + k/10.
    """
    wf = lexicons.word_freq(corpus.load(spark, sf_dir, "documents"))
    versions = spark.range(len(SNAPSHOT_DATES)).select(
        F.col("id").cast("int").alias("version")
    )
    snaps = wf.crossJoin(F.broadcast(versions))
    snaps = snaps.where(((F.length("word") + F.col("version")) % 3) != 0)
    return snaps.select(
        "word",
        "version",
        F.to_timestamp(
            F.element_at(
                F.array(*[F.lit(d) for d in SNAPSHOT_DATES]), F.col("version") + 1
            )
        ).alias("valid_from"),
        F.round(F.col("wf_freq_log") + F.col("version") / 10.0, 6).alias("lex_value"),
    )


SQL_SNAPSHOTS_CTE = (
    """
snaps AS (
    SELECT word,
           CAST(v.version AS INT) AS version,
           CAST(['"""
    + "','".join(SNAPSHOT_DATES)
    + """'][v.version + 1] AS TIMESTAMP) AS valid_from,
           ROUND("""
    + sql_freq_log("wf_count", "(SELECT COUNT(*) FROM tok)")
    + """ + v.version / 10.0, 6) AS lex_value
    FROM (SELECT word, COUNT(*) AS wf_count FROM tok GROUP BY word) wf
    CROSS JOIN (SELECT CAST(range AS INT) AS version FROM range(3)) v
    WHERE (length(word) + v.version) % 3 <> 0
)"""
)


def asof_buckets_for(n_left: int, parallelism: int, target_rows: int = 250_000) -> int:
    """Cogroup bucket count for :func:`asof_join`.

    Enough buckets that (a) cores stay busy with slack for stragglers
    (16x parallelism) and (b) a single bucket's left side stays
    ~target_rows, so the pandas frame a merge task materializes is
    bounded (~15 MB) at any corpus size — the same cardinality-derived
    convention as ``n_planes_for`` / ``pack_shards_for``. Measured at
    34.6M tokens on local[4]: 16 buckets = 44.2s, 64 = 24.4s,
    256 = 19.6s — oversized frames pay in sort + Arrow batch + memory
    pressure, while extra buckets cost only a per-group dispatch that
    stays negligible until key-cardinality grain (the shape this
    bucketing replaced). target_rows=250k lands the formula on the
    measured optimum (34.6M -> 139 buckets, within the flat 64-256
    region) instead of the previous 1M, which picked the measured-
    slower 64-bucket point (round-5 advice).
    """
    return max(16 * parallelism, -(-n_left // target_rows))


def _estimate_rows(df: DataFrame) -> int:
    """Action-free cardinality estimate from catalyst statistics.

    Replaces the former ``left.count()`` at DataFrame-construction time
    (round-5 advice: the count made construction eager — a full
    fact-side job per call, silently excluded from any timing window
    that builds the frame before t0). Estimates only size a BUCKET
    COUNT, so an order-of-magnitude answer is fine; 0 on any failure
    (the 16x-parallelism floor then decides alone).
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
        width = max(8 * len(df.columns), 1)
        return max(1, int(str(stats.sizeInBytes())) // width)
    except Exception:
        return 0


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str,
    by: list[str],
    value_cols: list[str],
    salt_k: int = 8,
    n_buckets: int | None = None,
) -> DataFrame:
    """Generic backward as-of join via bucket-cogrouped ``pd.merge_asof``.

    left[on] is matched to the greatest right[right_on] <= left[on]
    within equal `by` keys.

    INVARIANT: the snapshot side must be unique on (by, right_on).
    With duplicate valid_from rows per key the three strategies may
    break ties differently (pandas merge_asof takes the input-order
    last row, the broadcast max_by may mix columns across tied rows,
    the array strategy picks the max version deterministically) —
    round-5 advice; the snapshot builders here guarantee uniqueness.

    Parallel shape: both sides are hashed on the `by` keys into
    ``n_buckets`` cogroup buckets (cardinality-derived via
    :func:`asof_buckets_for` when not given) and each bucket runs ONE
    vectorized ``pd.merge_asof(..., by=by)`` over all of its keys.
    Grouping the cogroup by the raw `by` keys instead (the obvious
    translation) creates |key-space| tiny pandas groups — measured 16x
    slower end-to-end at 640k docs (BENCH.md round 5): per-group Python
    dispatch dominates and Arrow batching degenerates. Bucket-grain
    keeps the merge itself C-speed and makes task count independent of
    key cardinality.

    Skew: a hot `by` key would fill one bucket, so the left side is
    salted first — ``salt = pmod(hash(row), salt_k)`` joins the `by`
    keys, the right side is replicated across all salt values, and one
    hot key spreads over ``salt_k`` buckets with identical results.
    """
    if salt_k and salt_k > 1:
        left = left.withColumn(
            "_salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt_k))
        )
        salts = left.sparkSession.range(salt_k).select(
            F.col("id").cast("int").alias("_salt")
        )
        right = right.crossJoin(F.broadcast(salts))
        by = [*by, "_salt"]
        out = asof_join(
            left, right, on, right_on, by, value_cols, salt_k=0, n_buckets=n_buckets
        )
        return out.drop("_salt")
    from pyspark.sql.types import StructField

    # appended columns must be nullable: unmatched left rows carry NULLs
    # even when the right column itself is non-nullable
    out_schema = StructType(
        [f for f in left.schema.fields]
        + [
            StructField(c, right.schema[c].dataType, nullable=True)
            for c in ["version", *value_cols]
            if c in right.columns
        ]
    )
    left_cols = [f.name for f in left.schema.fields]
    by = list(by)

    if n_buckets is None:
        n_buckets = asof_buckets_for(
            _estimate_rows(left),
            left.sparkSession.sparkContext.defaultParallelism,
        )
    bucket = F.pmod(F.hash(*[F.col(c) for c in by]), F.lit(n_buckets))
    left_b = left.withColumn("_asof_bkt", bucket)
    right_b = right.withColumn("_asof_bkt", bucket)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(on, kind="mergesort")
        keep = ["version", *value_cols] if "version" in rpdf.columns else value_cols
        if rpdf.empty:
            merged = lpdf.copy()
            for c in keep:
                merged[c] = pd.NA
        else:
            rpdf = rpdf.sort_values(right_on, kind="mergesort")
            merged = pd.merge_asof(
                lpdf,
                rpdf[[*by, right_on, *keep]],
                left_on=on,
                right_on=right_on,
                by=by,  # exact key match inside the bucket
                direction="backward",  # zero temporal leakage
            )
        if "version" in merged.columns:
            # unmatched rows turn version into float NaN — restore a
            # nullable int so Arrow maps it onto the declared IntegerType
            merged["version"] = merged["version"].astype("Int32")
        return merged[left_cols + keep]

    return (
        left_b.groupBy("_asof_bkt")
        .cogroup(right_b.groupBy("_asof_bkt"))
        .applyInPandas(merge, schema=out_schema)
    )


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str,
    by: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of via broadcast + max_by (small snapshot dimension)."""
    cond = [left[c] == right[c] for c in by] + [left[on] >= right[right_on]]
    j = left.join(F.broadcast(right), cond, "left")
    lcols = [left[f.name] for f in left.schema.fields]
    aggs = [
        F.max_by(right[c], right[right_on]).alias(c) for c in ["version", *value_cols]
    ]
    return j.groupBy(*lcols).agg(*aggs)


def asof_join_array(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str,
    by: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of via a broadcast per-key timeline array — the
    zero-shuffle plan for a broadcastable snapshot dimension.

    The right side collapses to one row per `by` key holding its version
    timeline sorted ascending by `right_on` (struct sort = first-field
    sort); the fact side broadcast-joins it (narrow — no exchange on the
    fact table) and each row picks the last timeline entry with
    ``right_on <= on`` via ``filter`` + ``try_element_at(-1)``, all
    inside whole-stage codegen. Cost per row is O(|versions|); no Arrow
    transfer, no Python, no wide groupBy — unlike
    :func:`asof_join_broadcast`, which re-aggregates the fact table by
    every left column to undo the range-join multiplicity, this never
    multiplies rows at all. Measured 4x faster than max_by and ~20x
    faster than the cogrouped merge at 640k docs (BENCH.md round 5).
    """
    timeline = right.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(F.struct(right_on, "version", *value_cols))
        ).alias("_tl")
    )
    j = left.join(F.broadcast(timeline), by, "left")
    hit = F.try_element_at(
        F.filter("_tl", lambda x: x[right_on] <= F.col(on)), F.lit(-1)
    )
    left_cols = [f.name for f in left.schema.fields]
    return j.select(
        *left_cols,
        hit["version"].alias("version"),
        *[hit[c].alias(c) for c in value_cols],
    )


_ASOF_STRATEGIES = {
    "merge": asof_join,
    "broadcast": asof_join_broadcast,
    "array": asof_join_array,
}


def asof_doc_features(
    spark: SparkSession,
    sf_dir: str,
    strategy: str = "merge",
    snapshots: DataFrame | None = None,
) -> DataFrame:
    """Doc-grain features computed against the as-of lexicon snapshot.

    Each token of a document resolves to the latest snapshot of its word
    with valid_from <= event_ts; documents earlier than every snapshot of
    a word get NULL (missing-version behavior, never leakage).

    ``snapshots``: a prebuilt versioned snapshot table (word, version,
    valid_from, lex_value) — the production shape, where the lexicon
    dimension is a maintained table, not recomputed per query. Defaults
    to deriving :func:`lexicon_snapshots` from the corpus (the
    self-contained registered-query form).
    """
    documents = corpus.load(spark, sf_dir, "documents")
    tok = corpus.with_event_ts(corpus.tokens_long(documents))
    # manual column pruning: the as-of strategies are join/cogroup black
    # boxes to Catalyst (applyInPandas especially), so project the fact
    # side down BEFORE the join — at the merge path this is ~40% less
    # Arrow traffic. word_idx stays: asof_join_broadcast's de-duplicating
    # groupBy needs every fact row to be key-unique.
    tok = tok.select("doc_id", "word_idx", "word", "event_ts")
    snaps = snapshots if snapshots is not None else lexicon_snapshots(spark, sf_dir)
    join = _ASOF_STRATEGIES[strategy]
    enriched = join(
        tok,
        snaps,
        on="event_ts",
        right_on="valid_from",
        by=["word"],
        value_cols=["lex_value"],
    )
    from tscan_spark.functions.scalars import fp_mean

    matched = F.sum(F.col("lex_value").isNotNull().cast("int"))
    return (
        enriched.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("token_cnt"),
            matched.cast("long").alias("matched_cnt"),
            F.sum(F.col("lex_value").isNull().cast("int")).cast("long").alias(
                "missing_cnt"
            ),
            # fixed-point mean: exact int sum -> order-independent across
            # engines and partitionings (value-hash comparable)
            fp_mean("lex_value", matched).alias("avg_lex_value"),
            F.max("version").cast("int").alias("max_version"),
        )
        .withColumn("token_cnt", F.col("token_cnt").cast("long"))
    )


def sql_asof_doc_features() -> str:
    return (
        "WITH "
        + corpus.SQL_TOK_CTE.strip()
        + ",\n"
        + SQL_SNAPSHOTS_CTE.strip()
        + """,
tok_ts AS (
    SELECT tok.*,
           CAST(DATE '2024-01-01' + CAST(doc_id % 90 AS INT) AS TIMESTAMP) AS event_ts
    FROM tok
),
enriched AS (
    SELECT t.doc_id, t.word_idx, s.version, s.lex_value
    FROM tok_ts t
    ASOF LEFT JOIN snaps s
      ON t.word = s.word AND t.event_ts >= s.valid_from
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS token_cnt,
       CAST(SUM(CASE WHEN lex_value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS matched_cnt,
       CAST(SUM(CASE WHEN lex_value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS missing_cnt,
       CASE WHEN SUM(CASE WHEN lex_value IS NOT NULL THEN 1 ELSE 0 END) <> 0 THEN
            ROUND(SUM(CAST(ROUND(lex_value * 1000000, 0) AS BIGINT)) / 1000000.0
                  / SUM(CASE WHEN lex_value IS NOT NULL THEN 1 ELSE 0 END), 6)
       END AS avg_lex_value,
       CAST(MAX(version) AS INT) AS max_version
FROM enriched
GROUP BY doc_id"""
    )
