"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship T-Scan document-feature query at sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB-equivalent SQL for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full T-Scan document feature ladder
    (token explode -> broadcast lexicon joins -> sentence fold -> doc
    merge -> ratio select) on /root/testdata/sf0.001."""
    from tscan_spark.pipeline import doc_features
    from tscan_spark.session import tune

    tune(spark)
    return doc_features(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tscan_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tscan_spark.registry import ORACLES

    return dict(ORACLES)
