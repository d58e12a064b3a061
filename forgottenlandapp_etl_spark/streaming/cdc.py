"""Streaming CDC apply: changelog → keyed snapshot via foreachBatch MERGE.

The missing write-side streaming shape beside the aggregate drains
(online.py) and the stateful accumulator (stateful.py): a CHANGE LOG —
per-key upserts and deletes ordered by (event time, event id) — folded into
a materialized snapshot table, the Structured-Streaming form of K3/K5
(sources/sinks.py upsert + merge_rows; reference semantics etl.dart:357-382
where matched rows update and unmatched insert, extended with tombstones).

Contract (deterministic, batch-boundary-independent): the final snapshot
holds, for every key, the payload of its LAST change by the total order
(ts, event_id) — unless that last change is a delete, in which case the key
is absent. Because the per-key winner is an associative/commutative MAX
under that order, re-reducing any partition of the changelog gives the same
snapshot: micro-batch boundaries, replays after failure, and out-of-order
arrival all collapse to the same table, which is exactly why the merge is
idempotent (exactly-once through at-least-once delivery).

Scale shape: the snapshot is partitioned by a hash BUCKET of the key, and
each micro-batch rewrites ONLY the buckets its keys touch (dynamic
partition overwrite) after merging with those buckets' current rows — at
100 TB a steady trickle of changes re-reduces a bounded working set, never
the whole table. The per-batch reduce is one map-side-combinable MAX_BY per
key; the merge adds one bucket-pruned scan of the touched buckets. The
touched-bucket list is a ≤n_buckets-row collect — metadata-sized by
construction.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import sinks

N_BUCKETS = 16

# payload carried through the merge; ts_us BIGINT (not TIMESTAMP) so the
# snapshot parquet round-trips bit-exactly regardless of writer timestamp
# encoding (the round-2 nanos lesson)
_SNAPSHOT_COLS = ("key", "ts_us", "event_id", "is_delete", "value_cents")


def reduce_changelog(changes: DataFrame) -> DataFrame:
    """One row per key: the change with the greatest (ts_us, event_id).

    MAX_BY over a struct comparator — associative, commutative, and
    map-side combinable, which is what makes the whole CDC apply
    batch-boundary-independent. event_id is unique, so the order is strict
    and the winner deterministic.
    """
    return (
        changes.groupBy("key")
        .agg(
            F.max_by(
                F.struct("ts_us", "event_id", "is_delete", "value_cents"),
                F.struct("ts_us", "event_id"),
            ).alias("s")
        )
        .select("key", "s.ts_us", "s.event_id", "s.is_delete", "s.value_cents")
    )


def merge_batch(batch: DataFrame, target: str, n_buckets: int = N_BUCKETS) -> None:
    """MERGE one micro-batch of changes into the bucket-partitioned snapshot.

    Reduce the batch per key, read ONLY the touched buckets' current rows,
    re-reduce the union, dynamic-partition-overwrite those buckets. The
    merged relation is eagerly materialized (localCheckpoint) before the
    overwrite so the self-read never races the rewrite.
    """
    spark = batch.sparkSession
    winners = reduce_changelog(batch).withColumn(
        "bucket", F.expr(f"pmod(key, {n_buckets})").cast("int")
    )
    if os.path.isdir(target) and any(
        n.startswith("bucket=") for n in os.listdir(target)
    ):
        touched = [r["bucket"] for r in winners.select("bucket").distinct().collect()]
        existing = spark.read.parquet(target).where(F.col("bucket").isin(touched))
        merged = reduce_changelog(
            existing.select(*_SNAPSHOT_COLS).unionByName(
                winners.select(*_SNAPSHOT_COLS)
            )
        ).withColumn("bucket", F.expr(f"pmod(key, {n_buckets})").cast("int"))
    else:
        merged = winners
    merged = merged.select(*_SNAPSHOT_COLS, "bucket").localCheckpoint(eager=True)
    sinks.upsert_partitions(merged, target, partition_cols=("bucket",))


def apply_events_changelog(
    spark: SparkSession, sf_dir: str, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Drain the events table as a CDC stream and return the final snapshot.

    Interpretation of the events changelog: key = user_id, 'error' events
    are tombstones (deletes), every other event upserts the (fixed-point)
    value; rows without an event time have no place in the (ts, event_id)
    order and are dropped on both sides. Output: live keys only, with the
    winning payload — (user_id, value_cents, last_ts_us, last_event_id).
    """
    from .ts import staged_events_stream

    root = tempfile.mkdtemp(prefix="cdc_apply_")
    target = os.path.join(root, "snapshot")
    ckpt = os.path.join(root, "ckpt")
    try:
        with staged_events_stream(spark, sf_dir) as stream:
            changes = stream.where(F.col("ets").isNotNull()).select(
                F.col("user_id").alias("key"),
                F.unix_micros("ets").alias("ts_us"),
                "event_id",
                (F.col("event_type") == "error").alias("is_delete"),
                F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
            )
            q = (
                changes.writeStream.foreachBatch(
                    lambda b, _id: None if b.isEmpty() else merge_batch(b, target, n_buckets)
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        out = (
            spark.read.parquet(target)
            .where(~F.col("is_delete"))
            .select(
                F.col("key").alias("user_id"),
                "value_cents",
                F.col("ts_us").alias("last_ts_us"),
                F.col("event_id").alias("last_event_id"),
            )
            .localCheckpoint(eager=True)  # snapshot dir is removed below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out
