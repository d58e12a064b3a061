"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship snapshot-diff query (SURVEY.md §3
E2, the reference's /expgain pipeline re-expressed Spark-first) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator registry
(forgottenlandapp_etl_spark.plans) for the DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from forgottenlandapp_etl_spark.plans import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["j1_snapshot_diff"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each queries() entry."""
    return dict(registry.ORACLE)
