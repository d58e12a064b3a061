"""Streaming SCD-type-2 maintenance via affected-key partial recomputation.

The write-side streaming shape for ORDER-SENSITIVE history: unlike the CDC
snapshot (cdc.py), whose per-key winner is an associative MAX, SCD2
interval compression is a gaps-and-islands segmentation — a run boundary
depends on the NEIGHBORING event in (ts, event_id) order, so late rows can
split or merge intervals anywhere in a user's history and no per-row merge
function exists. The exact incremental discipline is therefore
affected-key recomputation (the standard IVM treatment of non-distributive
views): per micro-batch, only the users whose keys appear in the delta get
their history re-segmented, from a bucket-partitioned accumulated log that
is partition-pruned to exactly those users' buckets; everyone else's
interval rows are not even read.

Exactly-once through at-least-once delivery, by construction:
- the raw log append is keyed by BATCH ID (``log/batch=K/bucket=J``,
  written with mode=overwrite) — a replayed micro-batch rewrites its own
  delta directory byte-for-byte instead of double-appending (the
  datasheet twin's idempotent-delta discipline);
- the interval store rewrite goes through sinks.upsert_partitions — the
  K3 generation-pointer publish — so a crash mid-rewrite leaves the
  previous generation live and a replay converges to the same rows;
- recomputation is a pure function of the accumulated log, so the LAST
  batch touching a user always leaves that user's intervals equal to the
  batch segmentation of their complete history — which is exactly what
  the shared batch oracle states.

Scale shape: per batch, work = (batch reduce to touched buckets, ≤
N_BUCKETS-row collect) + (partition-pruned log scan of touched buckets) +
(one user-partitioned window segmentation of those buckets) + (dynamic
overwrite of those buckets' interval rows). The log grows with history —
re-segmenting a touched bucket reads that bucket's full history, the
standard compaction tradeoff of any order-sensitive IVM; at production
scale the bucket count is sized so a bucket's history fits an executor
spill budget, and cold buckets are never read.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import sinks

N_BUCKETS = 16


def segment_runs(ev: DataFrame) -> DataFrame:
    """Gaps-and-islands on VALUE change: consecutive equal event_type runs
    per user over the strict (ts_us, event_id) order collapse to
    [from_us, to_us] interval rows — the same segmentation as the batch
    scd2_intervals entry, over the nanos-proof BIGINT epoch carrier."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    g = ev.select(
        "user_id", "ts_us", "event_id", "event_type", chg.alias("chg")
    ).withColumn(
        "grp",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        g.groupBy("user_id", "event_type", "grp")
        .agg(
            F.min("ts_us").alias("from_us"),
            F.max("ts_us").alias("to_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "event_type", "from_us", "to_us", "n_events")
    )


def apply_batch(
    batch: DataFrame,
    batch_id: int,
    log_dir: str,
    target: str,
    n_buckets: int = N_BUCKETS,
) -> None:
    """One micro-batch: idempotent delta append, then affected-bucket
    re-segmentation and atomic interval-store rewrite."""
    spark = batch.sparkSession
    delta = batch.withColumn(
        "bucket", F.expr(f"pmod(user_id, {n_buckets})").cast("int")
    ).localCheckpoint(eager=True)
    # batch-keyed delta: a replay rewrites its own directory, never appends
    delta.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(log_dir, f"batch={batch_id}")
    )
    touched = [r["bucket"] for r in delta.select("bucket").distinct().collect()]
    if not touched:
        return
    log = (
        spark.read.option("basePath", log_dir)
        .parquet(log_dir)
        .where(F.col("bucket").isin(touched))
    )
    intervals = segment_runs(
        log.select("user_id", "ts_us", "event_id", "event_type")
    ).withColumn("bucket", F.expr(f"pmod(user_id, {n_buckets})").cast("int"))
    intervals = intervals.localCheckpoint(eager=True)
    sinks.upsert_partitions(intervals, target, partition_cols=("bucket",))


def maintain_scd2_intervals(
    spark: SparkSession, sf_dir: str, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Drain the events table as a stream and return the maintained SCD2
    interval table — equal to the batch segmentation of the full history
    (the shared oracle). NULL event times have no place in the
    (ts, event_id) order and are dropped on both sides."""
    from .ts import staged_events_stream

    root = tempfile.mkdtemp(prefix="scd2_stream_")
    log_dir = os.path.join(root, "log")
    target = os.path.join(root, "intervals")
    ckpt = os.path.join(root, "ckpt")
    try:
        with staged_events_stream(spark, sf_dir) as stream:
            ev = stream.where(F.col("ets").isNotNull()).select(
                "user_id",
                F.unix_micros("ets").alias("ts_us"),
                "event_id",
                "event_type",
            )
            q = (
                ev.writeStream.foreachBatch(
                    lambda b, bid: None
                    if b.isEmpty()
                    else apply_batch(b, bid, log_dir, target, n_buckets)
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        out = (
            spark.read.parquet(target)
            .select("user_id", "event_type", "from_us", "to_us", "n_events")
            .localCheckpoint(eager=True)  # store dir is removed below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out
