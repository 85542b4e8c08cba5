"""Cache-ownership contract for queries whose plans persist subtrees.

A few queries persist a shared subtree because their plan consumes it
several times and exchange reuse does not cover it (measured in the
dedup family: dropping the persist cost +60% on minhash_lsh at sf0.1;
the unified doc profile reuses one annotated token grain across ~12
aggregation paths). The cache belongs to the RETURNED plan, so the
library cannot unpersist before the caller executes it; instead the
cached frames are recorded on the result and the caller releases them
after consuming it via :func:`release_caches` (or a blanket
``spark.catalog.clearCache()``, as bench.py does between queries).

At corpus scale the same shape is a materialization: the shared grain
is written once to a staging (Iceberg/parquet) table and the batteries
read the staging table — identical plan topology, storage-backed
instead of memory-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def with_cache(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Record the persisted subtrees ``out``'s plan depends on."""
    existing = list(getattr(out, "_tscan_caches", []))
    object.__setattr__(out, "_tscan_caches", existing + list(cached))
    return out


def carry_caches(out: DataFrame, *srcs: DataFrame) -> DataFrame:
    """Propagate cache handles from ``srcs`` onto ``out`` (DataFrame
    transformations return new objects, so the handle attribute does
    not survive a select/join — re-attach it where lineage continues)."""
    handles: list[DataFrame] = []
    for s in srcs:
        handles.extend(getattr(s, "_tscan_caches", []))
    return with_cache(out, *handles) if handles else out


def release_caches(df: DataFrame) -> None:
    """Unpersist every cache a query attached to ``df``'s plan."""
    for cached in getattr(df, "_tscan_caches", []):
        cached.unpersist()
    if hasattr(df, "_tscan_caches"):
        object.__setattr__(df, "_tscan_caches", [])
