"""Incremental feature materialization over snapshot appends.

North-rule closure: the engine's input is "an Iceberg table of
pre-tokenized training sequences" and jobs must be "resumable from
Iceberg snapshot checkpoints".  A 100 TB ingest arrives as a stream of
table commits (one crawl / shard / day per snapshot); recomputing the
feature table from scratch per commit is a full corpus pass each time.
The production shape is incremental materialization:

    for each UNPROCESSED source snapshot, in commit order:
        delta    = incremental scan of exactly that commit's appends
        features = feature_fn(delta)           (per-document, pure)
        append features as a new snapshot of the DERIVED table,
        stamping the manifest with source_snapshot_id

Resume is free: the high-water mark IS the derived table's own
manifest chain (max ``source_snapshot_id`` over committed manifests),
so a job killed between commits restarts exactly after the last
atomically-published manifest — no separate checkpoint state, the
same recovery rule Iceberg consumers use.  Each step's cost is
O(delta), never O(table); the equivalence ``incremental == batch``
holds for any per-document (row-local) feature_fn, which is the
documented contract (cross-document aggregates need the drift/profile
batch paths instead).

Reference analog: the reference processes one document per invocation
and appends rows to its CSV sinks (tscan.cxx main loop); this is that
append-only contract lifted to table commits with exactly-once
semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscan_spark import corpus
from tscan_spark.sources import snapshots


def last_processed_source_id(feat_table_dir: str) -> int:
    """High-water mark: the max source snapshot id already materialized
    (0 if the derived table has no commits yet)."""
    return max(
        (
            m.get("source_snapshot_id", 0)
            for m in snapshots.snapshot_log(feat_table_dir)
        ),
        default=0,
    )


def incremental_materialize(
    spark: SparkSession,
    src_table_dir: str,
    feat_table_dir: str,
    feature_fn: Callable[[DataFrame], DataFrame],
    on_commit: Callable[[int], None] | None = None,
) -> dict:
    """Materialize ``feature_fn`` over every unprocessed source commit.

    Returns {"processed": [src ids], "skipped": n, "rows": n}.
    ``on_commit`` is a test hook fired after each derived commit (e.g.
    to simulate a crash mid-job and exercise resume).
    """
    src_log = snapshots.snapshot_log(src_table_dir)
    hwm = last_processed_source_id(feat_table_dir)
    metrics: dict = {"processed": [], "skipped": 0, "rows": 0}
    for m in src_log:
        sid = m["snapshot_id"]
        if sid <= hwm:
            metrics["skipped"] += 1
            continue
        delta = snapshots.read_snapshot_delta(spark, src_table_dir, sid - 1, sid)
        out = feature_fn(delta)
        committed = snapshots.append_snapshot(
            out,
            feat_table_dir,
            commit_ts=m["commit_ts"],
            extra={"source_snapshot_id": sid},
        )
        metrics["processed"].append(sid)
        metrics["rows"] += committed["rows_added"]
        if on_commit is not None:
            on_commit(sid)
    return metrics


# ---------------------------------------------------------------------------
# per-document feature fn + registered demo
# ---------------------------------------------------------------------------
#
# The registered query builds the deterministic 3-commit source table
# (commit k appends the doc_id % 3 == k-1 slice, the snapshots.py demo
# convention), incrementally materializes a doc-grain feature table,
# and returns the FULL derived table with each row's producing commit.
# The DuckDB oracle computes the same features over the whole documents
# table in one batch and derives src_snapshot arithmetically — i.e. the
# gate checks the load-bearing equivalence: incremental == batch, and
# every row landed in the right delta.


def doc_token_features(delta: DataFrame) -> DataFrame:
    """Per-document (row-local) features: token/type counts, mean word
    length (9 dp fixed convention)."""
    return (
        corpus.tokens_long(delta)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.countDistinct("word").cast("long").alias("n_types"),
            F.round(F.avg(F.length("word")), 9).alias("awl"),
        )
    )


def incremental_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-commit incremental build; returns doc_id, src_snapshot,
    n_tok, n_types, awl over the full derived table."""
    import os
    import shutil

    tag = os.path.basename(os.path.normpath(sf_dir))
    src_dir = f"/tmp/tscan_incr_src_{tag}"
    feat_dir = f"/tmp/tscan_incr_feat_{tag}"
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(feat_dir, ignore_errors=True)

    docs = corpus.load(spark, sf_dir, "documents")
    n = snapshots.N_DEMO_COMMITS
    for k in range(1, n + 1):
        snapshots.append_snapshot(
            docs.where(F.col("doc_id") % n == k - 1), src_dir, commit_ts=float(k)
        )
    incremental_materialize(spark, src_dir, feat_dir, doc_token_features)

    feat_log = snapshots.snapshot_log(feat_dir)
    parts = [
        snapshots.read_snapshot_delta(
            spark, feat_dir, m["snapshot_id"] - 1, m["snapshot_id"]
        ).withColumn(
            "src_snapshot", F.lit(m["source_snapshot_id"]).cast("int")
        )
        for m in feat_log
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "doc_id", "src_snapshot", "n_tok", "n_types", "awl"
    ).orderBy("doc_id")


SQL_INCREMENTAL_FEATURES = (
    "WITH "
    + corpus.SQL_TOK_CTE.strip()
    + f"""
SELECT doc_id,
       CAST(doc_id % {snapshots.N_DEMO_COMMITS} + 1 AS INT) AS src_snapshot,
       CAST(COUNT(*) AS BIGINT) AS n_tok,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_types,
       ROUND(AVG(LENGTH(word)), 9) AS awl
FROM tok
GROUP BY doc_id
ORDER BY doc_id"""
)


# ---------------------------------------------------------------------------
# incremental cross-snapshot dedup (new commits vs the accumulated index)
# ---------------------------------------------------------------------------
#
# The production ingest rule: every new crawl commit is deduplicated
# against everything ALREADY ingested before it lands in the training
# corpus. The dedup index (fingerprint -> first owner) is itself
# derived state maintained commit-by-commit — the incremental shape
# again, applied to dedup instead of features. The key here is the
# first-FP_TOKENS-token prefix fingerprint (the boilerplate-dedup
# convention; the synthetic corpus has no exact-text duplicates but 24
# prefix collisions at sf0.001, so the path is exercised for real).
#
# Physical plan per commit: O(delta) fingerprint projection; one
# hash-join of the delta against the index on the fingerprint key (at
# scale the index is a bucketed table on fp, making this join
# shuffle-free on the index side); one delta-local window for
# within-commit firsts; index grows by the commit's new fingerprints
# (localCheckpoint per commit keeps the loop's plan constant-size —
# same lesson as the CC loop in dedup.py).

FP_TOKENS = 8


def _fingerprint_expr():
    return F.md5(
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, FP_TOKENS))
    )


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-commit demo: dedupe each commit's delta against the index.

    Columns: doc_id, src_snapshot, fp, is_new (first holder of the
    fingerprint across commit order, doc_id tiebreak within a commit).
    The oracle replays the whole history as one batch window — the
    incremental == batch equivalence for the dedup index."""
    import os
    import shutil

    tag = os.path.basename(os.path.normpath(sf_dir))
    src_dir = f"/tmp/tscan_incrdd_src_{tag}"
    shutil.rmtree(src_dir, ignore_errors=True)

    docs = corpus.load(spark, sf_dir, "documents")
    n = snapshots.N_DEMO_COMMITS
    for k in range(1, n + 1):
        snapshots.append_snapshot(
            docs.where(F.col("doc_id") % n == k - 1), src_dir, commit_ts=float(k)
        )

    from pyspark.sql import Window

    index = None  # (fp) fingerprints already owned by earlier commits
    outs = []
    for m in snapshots.snapshot_log(src_dir):
        sid = m["snapshot_id"]
        delta = snapshots.read_snapshot_delta(spark, src_dir, sid - 1, sid)
        local = delta.select(
            "doc_id", _fingerprint_expr().alias("fp")
        ).withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        if index is None:
            joined = local.withColumn("known", F.lit(False))
        else:
            joined = local.join(
                index.withColumn("known", F.lit(True)), "fp", "left"
            ).withColumn("known", F.coalesce("known", F.lit(False)))
        out_k = joined.select(
            "doc_id",
            F.lit(sid).cast("int").alias("src_snapshot"),
            "fp",
            ((~F.col("known")) & (F.col("rk") == 1)).alias("is_new"),
        )
        outs.append(out_k)
        fresh = joined.where((~F.col("known")) & (F.col("rk") == 1)).select("fp")
        index = (
            fresh if index is None else index.unionByName(fresh)
        ).localCheckpoint()

    out = outs[0]
    for p in outs[1:]:
        out = out.unionByName(p)
    return out.orderBy("doc_id")


SQL_DEDUP_INCREMENTAL = f"""
WITH h AS (
    SELECT doc_id,
           CAST(doc_id % {snapshots.N_DEMO_COMMITS} + 1 AS INT) AS src_snapshot,
           md5(array_to_string(string_split(text, ' ')[1:{FP_TOKENS}], ' ')) AS fp
    FROM documents
)
SELECT doc_id, src_snapshot, fp,
       ROW_NUMBER() OVER (
           PARTITION BY fp ORDER BY src_snapshot, doc_id) = 1 AS is_new
FROM h
ORDER BY doc_id"""
