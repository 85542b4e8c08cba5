"""Snapshot table format with time-travel reads (Iceberg analog).

North-rule framing: the engine's canonical input is "an Iceberg table
of pre-tokenized training sequences"; feature extraction must join each
doc_id×timestamp against the LATEST lexicon/corpus-statistics snapshot
with zero temporal leakage, and jobs resume from snapshot checkpoints.
No Iceberg runtime ships in this container, so this module implements
the same table semantics directly over parquet + JSON manifests:

- ``append_snapshot``: an immutable commit.  Data lands under
  ``data/snap=<id>/``; a manifest ``_snapshots/<id>.json`` records the
  snapshot id, parent id, commit timestamp, row count and the data
  paths ADDED by this commit (Iceberg's append-manifest shape).
- ``read_snapshot``: time travel.  Resolving a snapshot id (or the
  latest commit at/before an ``as_of`` timestamp) and scanning the
  UNION of data paths along the parent chain — exactly Iceberg's
  "table state = manifest closure of a snapshot" rule.  Readers never
  see a half-written commit: the manifest is written last, atomically
  (tmp + rename), after the parquet is fully committed.
- ``snapshot_log``: the table history (id, parent, ts, rows).

The as-of resolution here is the TABLE-level counterpart of the
row-level as-of join in operators/asof.py: asof.py picks the latest
lexicon VERSION per row; this picks the latest table SNAPSHOT per job
run — both enforce the no-future-data rule, at different grains.

Scale notes: manifests are O(#commits) JSON files, read driver-side
once per query (same as Iceberg's metadata layer); data reads are
plain parquet scans so partition pruning / column pruning / predicate
pushdown all apply unchanged. Bucket-checkpointed jobs
(operators/checkpoint.py) map 1:1 — each bucket commit becomes an
``append_snapshot`` call.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_snapshots")


def snapshot_log(table_dir: str) -> list[dict]:
    """Table history, oldest first."""
    d = _manifest_dir(table_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.append(json.load(fh))
    return sorted(out, key=lambda m: m["snapshot_id"])


def append_snapshot(
    df: DataFrame,
    table_dir: str,
    commit_ts: float | None = None,
    extra: dict | None = None,
) -> dict:
    """Commit ``df`` as a new immutable snapshot; returns the manifest.

    ``extra`` merges application metadata into the manifest (Iceberg's
    snapshot summary properties) — e.g. the source snapshot id a derived
    table was materialized from (operators/incremental.py).
    """
    log = snapshot_log(table_dir)
    parent = log[-1]["snapshot_id"] if log else None
    snap_id = (parent or 0) + 1
    data_path = os.path.join(table_dir, "data", f"snap={snap_id}")
    df.write.mode("overwrite").parquet(data_path)
    rows = df.sparkSession.read.parquet(data_path).count()
    manifest = {
        "snapshot_id": snap_id,
        "parent_id": parent,
        "commit_ts": commit_ts if commit_ts is not None else time.time(),
        "rows_added": rows,
        "paths_added": [data_path],
        "operation": "append",
        **(extra or {}),
    }
    d = _manifest_dir(table_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{snap_id}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(d, f"{snap_id:012d}.json"))
    return manifest


def resolve_snapshot(
    table_dir: str,
    snapshot_id: int | None = None,
    as_of: float | None = None,
) -> dict:
    """Resolve a snapshot by id, by timestamp, or the current one."""
    log = snapshot_log(table_dir)
    if not log:
        raise FileNotFoundError(f"no snapshots under {table_dir}")
    if snapshot_id is not None:
        for m in log:
            if m["snapshot_id"] == snapshot_id:
                return m
        raise KeyError(f"snapshot {snapshot_id} not found")
    if as_of is not None:
        eligible = [m for m in log if m["commit_ts"] <= as_of]
        if not eligible:
            raise KeyError(f"no snapshot at or before ts={as_of}")
        return eligible[-1]
    return log[-1]


def read_snapshot_delta(
    spark: SparkSession,
    table_dir: str,
    from_exclusive: int,
    to_inclusive: int,
) -> DataFrame:
    """Incremental scan: rows ADDED by snapshots in (from, to].

    Iceberg's incremental read (``start-snapshot-id``/``end-snapshot-id``)
    — the primitive incremental materialization is built on: a consumer
    that has processed up to snapshot ``from_exclusive`` reads exactly
    the append deltas of the later commits, never a full-table rescan.
    """
    paths: list[str] = []
    for m in snapshot_log(table_dir):
        if from_exclusive < m["snapshot_id"] <= to_inclusive:
            paths.extend(m["paths_added"])
    if not paths:
        raise KeyError(
            f"no snapshots in ({from_exclusive}, {to_inclusive}] under {table_dir}"
        )
    return spark.read.parquet(*paths)


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    as_of: float | None = None,
) -> DataFrame:
    """Time-travel scan: union of data paths along the parent chain."""
    log = {m["snapshot_id"]: m for m in snapshot_log(table_dir)}
    head = resolve_snapshot(table_dir, snapshot_id=snapshot_id, as_of=as_of)
    paths: list[str] = []
    cur: int | None = head["snapshot_id"]
    while cur is not None:
        m = log[cur]
        paths = m["paths_added"] + paths
        cur = m["parent_id"]
    return spark.read.parquet(*paths)


# ---------------------------------------------------------------------------
# Registered demo: deterministic 3-commit table + as-of read
# ---------------------------------------------------------------------------
#
# The registry needs a pure (spark, sf_dir) -> DataFrame surface, so the
# demo builds a snapshot table deterministically from the documents
# table (commit k appends the doc_id % 3 == k-1 slice at commit_ts = k)
# and reads it AS OF ts=2.5 — i.e. the first two commits only.  The
# DuckDB oracle replays the same predicate; the time-travel machinery
# (manifest chain, atomic commit, as-of resolution) is what's under
# test, plus dedicated pytest coverage for ids/chains/errors.

N_DEMO_COMMITS = 3
DEMO_AS_OF = 2.5


def _demo_table_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/tscan_snapshot_demo_{tag}"


def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the 3-commit demo table, read AS OF ts=2.5, aggregate.

    Output: source, n_docs, n_chars_sum (commits 1..2 only — time
    travel excludes the third commit).
    """
    import shutil

    from pyspark.sql import functions as F

    from tscan_spark import corpus

    table_dir = _demo_table_dir(sf_dir)
    shutil.rmtree(table_dir, ignore_errors=True)
    docs = corpus.load(spark, sf_dir, "documents")
    for k in range(1, N_DEMO_COMMITS + 1):
        append_snapshot(
            docs.where(F.col("doc_id") % N_DEMO_COMMITS == k - 1),
            table_dir,
            commit_ts=float(k),
        )
    snap = read_snapshot(spark, table_dir, as_of=DEMO_AS_OF)
    return (
        snap.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars_sum"),
        )
    )


def sql_snapshot_time_travel() -> str:
    return f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum
FROM documents
WHERE doc_id % {N_DEMO_COMMITS} < {N_DEMO_COMMITS - 1}
GROUP BY source"""
