"""SparkSession factory and runtime tuning.

The engine targets large multi-executor clusters (the reference's pipelines
re-expressed shuffle-clean), but tests and the driver harness run on
``local[N]``. Everything scale-relevant is declared here once:

- AQE on (runtime shuffle coalescing, skew-join splitting, broadcast demotion)
- shuffle partition count sized from the available parallelism
- Arrow enabled for any pandas interchange (vectorized UDF extensions)
- session timezone pinned to UTC so date derivation matches the DuckDB
  oracle, which treats parquet timestamps as naive local datetimes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def build_session(
    app_name: str = "forgottenlandapp-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]``; on a real cluster
    callers pass their own master / rely on spark-submit.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # runtime bloom-filter join pruning: selective join sides inject a
        # bloom filter into the probe-side scan — row-group skipping that
        # matters most at fact-table scale, free locally
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        # no \r-progress bars: they flood any captured-output harness (the
        # round-3 driver bench artifact lost its JSON line to exactly that)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master is None:
        master = f"local[{cpus}]"
    builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an externally provided session.

    The driver harness constructs its own SparkSession; every query entry
    point calls this to pin the runtime confs that affect semantics
    (timezone → date derivation) or plan quality (AQE). Only runtime-mutable
    confs are touched; failures are non-fatal.
    """
    try:
        par = str(spark.sparkContext.defaultParallelism)
    except Exception:
        par = "32"
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # sized, not the 200 default: AQE re-coalesces batch shuffles at
        # runtime anyway, but STREAMING state stores are created one per
        # shuffle partition at query start and never coalesced — 200 state
        # store instances per stateful op under a vanilla session is pure
        # machinery cost at any data size
        "spark.sql.shuffle.partitions": par,
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
