"""Bucketed warehouse tables — shuffle-free co-located joins (SURVEY.md
§4.3, BASELINE 100 TB posture).

At 100 TB the dominant cost of a big-big equi-join is the shuffle of both
sides. Bucketing pre-shuffles ONCE at write time: both tables hash-cluster
on the join key into the same bucket count, so every subsequent join/groupBy
on that key reads co-located buckets and plans with NO Exchange on either
side. This module is the write-side discipline; the plan gate in
tests/test_plans.py proves the Exchange disappears.

Bucketed tables must go through the session catalog (``saveAsTable``) —
plain ``.parquet(path)`` writes cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Cluster ``df`` into ``n_buckets`` hash buckets on ``bucket_col``.

    ``sort_col`` additionally sorts within buckets, upgrading downstream
    sort-merge joins to skip their sort phase. ``n_buckets`` should match
    across tables that join together (bucket-count mismatch reintroduces a
    shuffle on one side). ``path`` makes it an external table (data at
    ``path``, metadata in the session catalog) — warehouse.dir is a static
    conf, so tests and ad-hoc sessions pass an explicit location.
    """
    # cluster rows by bucket before the write: without this every upstream
    # task emits one file per bucket it holds (tasks x buckets small files
    # at scale); after it, each bucket is written by one task
    df = df.repartition(n_buckets, df[bucket_col])
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read; bucket metadata rides along and informs the planner."""
    return spark.table(table)
