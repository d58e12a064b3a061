"""Table registry over the driver-generated parquet test tables.

TESTDATA.md: TPC-H-ish star schema + ``events`` stream table +
``documents``/``embeddings`` at ``/root/testdata/sf{0.001,0.01,0.1}``.
Scans go through :func:`table` so every query benefits from parquet
column pruning + filter pushdown, and so a future move to a real
catalog (Delta / HMS / Unity) is one function swap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# The driver's parquet carries TIMESTAMP(NANOS), which Spark's reader
# rejects; session.tune() flips spark.sql.legacy.parquet.nanosAsLong so the
# scan succeeds, and the catalog restores a proper TimestampType here
# (integer div — nanos exceed double precision).
_TS_COLUMNS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one test table (predicate pushdown comes free)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    for c in _TS_COLUMNS.get(name, ()):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def spread(df: DataFrame, key: str | None = None) -> DataFrame:
    """Fan a small scan out across the cluster before expensive per-row work.

    At real scale the reader's split planning (maxPartitionBytes) already
    yields one task per 128 MB, so this guard is false and no shuffle is
    added. Tiny local fixtures arrive as a single parquet row group = one
    split, which would serialize explode/hash-heavy expansion onto one core;
    repartitioning costs a shuffle of the (small) input and unlocks full
    parallelism for everything downstream. Only applied when the scan has
    fewer splits than the session's parallelism.

    Pass ``key`` to hash-partition instead of round-robin: deterministic
    output placement keeps the exchange subtree reusable by Catalyst's
    ReuseExchange when several plan branches scan the same table.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # JVM-side split count: df.rdd would build a Python-serialization RDD
    # (driver-side plan conversion per call) just to read a number
    if df._jdf.rdd().getNumPartitions() < target:
        return df.repartition(target, F.col(key)) if key else df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
