"""Checkpointed, resumable batch execution with per-partition lineage.

North-rule requirement: the 10^12-sequence job must be resumable from
checkpoint with per-partition lineage and metrics. Spark-native design
(no Iceberg runtime in this container, same semantics with parquet
bucket partitions + a lineage ledger):

- work splits into K deterministic buckets: pmod(hash(doc_id), K);
- each bucket is computed and committed independently (parquet
  subdirectory + a lineage JSON recording bucket id, row count, key
  range, input fingerprint, wall time);
- resume = skip buckets whose lineage record exists; a killed job
  re-runs only incomplete buckets;
- bucket writes are idempotent (overwrite of the bucket subdir).

On an Iceberg deployment each bucket commit becomes a snapshot append
and the ledger is the snapshot log — the control flow is identical.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 8


def _lineage_dir(out_dir: str, lineage_dir: str | None = None) -> str:
    # the ledger defaults to living beside the data; a job may point it
    # at a separate checkpoint root (jobs/run_features.py --checkpoint)
    return lineage_dir if lineage_dir is not None else os.path.join(out_dir, "_lineage")


def completed_buckets(out_dir: str, lineage_dir: str | None = None) -> set[int]:
    d = _lineage_dir(out_dir, lineage_dir)
    if not os.path.isdir(d):
        return set()
    return {
        int(f.split("=")[1].split(".")[0])
        for f in os.listdir(d)
        if f.startswith("bucket=") and f.endswith(".json")
    }


def run_checkpointed(
    df: DataFrame,
    out_dir: str,
    key_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    on_bucket: Callable[[int], None] | None = None,
    lineage_dir: str | None = None,
) -> dict:
    """Compute ``df`` bucket-by-bucket with resume + lineage.

    Returns the job metrics dict {buckets_run, buckets_skipped, rows}.
    ``on_bucket`` is a test hook invoked after each bucket commit (e.g.
    to simulate a crash mid-job). ``lineage_dir`` relocates the ledger
    (default: ``out_dir/_lineage``) — e.g. a user-supplied checkpoint
    root on object storage.
    """
    ldir = _lineage_dir(out_dir, lineage_dir)
    os.makedirs(ldir, exist_ok=True)
    done = completed_buckets(out_dir, lineage_dir)
    if done:
        # resume safety: bucket membership is pmod(hash(key), n_buckets);
        # resuming with different parameters would silently skip or
        # duplicate rows (completed bucket ids would still "match")
        prior = job_lineage(out_dir, lineage_dir)[0]
        if prior.get("n_buckets") != n_buckets or prior.get("key_col") != key_col:
            raise ValueError(
                "checkpoint resume mismatch: prior run used "
                f"n_buckets={prior.get('n_buckets')} key_col={prior.get('key_col')!r}, "
                f"this call passed n_buckets={n_buckets} key_col={key_col!r}"
            )
    bucket_col = F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets))
    metrics = {"buckets_run": 0, "buckets_skipped": len(done), "rows": 0}
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        part = df.where(bucket_col == b)
        path = os.path.join(out_dir, f"bucket={b}")
        part.write.mode("overwrite").parquet(path)
        written = part.sparkSession.read.parquet(path)
        stats = written.agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(key_col).alias("key_min"),
            F.max(key_col).alias("key_max"),
        ).first()
        lineage = {
            "bucket": b,
            "rows": stats["rows"],
            "key_min": str(stats["key_min"]),
            "key_max": str(stats["key_max"]),
            "key_col": key_col,
            "n_buckets": n_buckets,
            "wall_sec": round(time.time() - t0, 3),
        }
        tmp = os.path.join(ldir, f"bucket={b}.json.tmp")
        final = os.path.join(ldir, f"bucket={b}.json")
        with open(tmp, "w") as f:
            json.dump(lineage, f)
        os.rename(tmp, final)  # atomic commit of the bucket
        metrics["buckets_run"] += 1
        metrics["rows"] += stats["rows"]
        if on_bucket is not None:
            on_bucket(b)
    return metrics


def read_checkpointed(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "bucket=*"))


def job_lineage(out_dir: str, lineage_dir: str | None = None) -> list[dict]:
    d = _lineage_dir(out_dir, lineage_dir)
    out = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.append(json.load(fh))
    return out
