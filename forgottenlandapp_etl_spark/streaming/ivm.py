"""Incremental view maintenance: changelog → additive rollup via
foreachBatch delta merge.

The third write-side streaming shape beside the keyed-snapshot CDC apply
(cdc.py) and the aggregate drains (online.py): a MATERIALIZED AGGREGATE
kept current by merging per-micro-batch DELTAS instead of recomputing —
the Materialize / dbt-incremental pattern. Each change row carries a
signed contribution (+1/+value for inserts, −1/−value for retractions);
the maintained view is the per-group SUM of contributions.

Contract (deterministic, batch-boundary-independent): SUM is associative
and commutative, so any partition of the changelog into micro-batches —
including replays after failure — folds to the same view. That is the
entire correctness argument, and it is the same one-line algebra that
makes the CDC apply's MAX_BY idempotent.

Scale shape: the view is partitioned by its group key's day; each
micro-batch reduces its own rows map-side (|groups|-sized delta), reads
ONLY the touched day partitions, adds counters, and dynamic-partition-
overwrites those days. A steady trickle of changes re-reduces a bounded
working set — never the whole view. The touched-day list is a
metadata-sized collect, same as cdc.merge_batch's bucket list.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import sinks

_VIEW_COLS = ("day", "event_type", "n_events", "sum_cents")


def _delta(batch: DataFrame) -> DataFrame:
    """Signed per-group contribution of one micro-batch."""
    return batch.groupBy("day", "event_type").agg(
        F.sum("dn").alias("n_events"), F.sum("dcents").alias("sum_cents")
    )


def merge_delta(batch: DataFrame, target: str) -> None:
    """Add one micro-batch's delta into the day-partitioned view."""
    spark = batch.sparkSession
    delta = _delta(batch)
    if os.path.isdir(target) and any(
        n.startswith("day=") for n in os.listdir(target)
    ):
        touched = [r["day"] for r in delta.select("day").distinct().collect()]
        existing = spark.read.parquet(target).where(F.col("day").isin(touched))
        merged = (
            existing.select(*_VIEW_COLS)
            .unionByName(delta.select(*_VIEW_COLS))
            .groupBy("day", "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_cents").alias("sum_cents"),
            )
        )
    else:
        merged = delta
    merged = merged.select(*_VIEW_COLS).localCheckpoint(eager=True)
    sinks.upsert_partitions(merged, target, partition_cols=("day",))


def maintain_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events table as an insert/retract changelog and return the
    maintained per-(day, event_type) rollup.

    Interpretation: 'error' events RETRACT one unit and their value
    (upstream corrections); every other event inserts. Rows without an
    event time are dropped on both sides (no place in the day key)."""
    from .ts import staged_events_stream

    root = tempfile.mkdtemp(prefix="ivm_rollup_")
    target = os.path.join(root, "view")
    ckpt = os.path.join(root, "ckpt")
    try:
        with staged_events_stream(spark, sf_dir) as stream:
            sign = F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(
                F.lit(1)
            )
            changes = stream.where(F.col("ets").isNotNull()).select(
                F.to_date("ets").cast("string").alias("day"),
                "event_type",
                sign.cast("long").alias("dn"),
                (sign * F.floor(F.col("value") * 100)).cast("long").alias("dcents"),
            )
            q = (
                changes.writeStream.foreachBatch(
                    lambda b, _id: None if b.isEmpty() else merge_delta(b, target)
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        out = (
            spark.read.parquet(target)
            # the day partition directory is type-inferred as DATE on
            # read-back; pin the contract dtype (string) explicitly
            .select(
                F.col("day").cast("string").alias("day"),
                "event_type",
                "n_events",
                "sum_cents",
            )
            .localCheckpoint(eager=True)  # view dir is removed below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out
