"""Streaming deduplication (SURVEY.md §2.9 extension): the continuous-
ingestion form of the batch dedup tiers in operators/dedup.py.

The shape a 100 TB training-data pipeline actually runs: documents/events
land continuously; exact duplicates must be dropped ON ARRIVAL (before the
expensive downstream stages), not in a nightly batch pass. Structured
Streaming's ``dropDuplicatesWithinWatermark`` keeps one state entry per key
and — unlike plain ``dropDuplicates`` — EVICTS state once the watermark
passes a key's event time, so state is bounded by the key-arrival rate ×
watermark horizon instead of growing with corpus lifetime.

Output determinism: only the KEY columns are emitted (never the arbitrary
surviving row), so the result set equals the batch ``SELECT DISTINCT`` and
is oracle-comparable even though which physical row survives a race is not.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ts import staged_events_stream


def _drain_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """availableNow drain through the memory sink → standalone DataFrame.

    Same lifecycle discipline as online.stream_events_daily_counts: the
    memory-sink table and checkpoint dir are released after materializing,
    so repeated invocations (gate, bench) don't accumulate session state.
    """
    spark = stream_df.sparkSession
    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        q = (
            stream_df.writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # JVM-side materialization: localCheckpoint pins the memory-sink
        # rows into block storage so the DataFrame outlives the temp view
        # WITHOUT a driver→Python→JVM row round trip (the old
        # collect+createDataFrame cost ~1-2 s on a 100k-row drain)
        out = spark.table(qname).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(qname)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


def stream_dedup_event_keys(
    spark: SparkSession, sf_dir: str, watermark: str = "1 day"
) -> DataFrame:
    """Streaming key-dedup over the events stream: first sighting of each
    (day, user_id, event_type) key is emitted, repeats within the watermark
    horizon are dropped, and state for days older than the watermark is
    evicted as event time advances.

    This is ingestion-time dedup (at-least-once delivery → effectively-once
    downstream): the streaming equivalent of batch ``SELECT DISTINCT``,
    which is exactly what the oracle checks. Emitting keys only keeps the
    output deterministic under arrival races.
    """
    with staged_events_stream(spark, sf_dir) as stream:
        keyed = (
            stream.withWatermark("ets", watermark)
            .select(
                F.to_date("ets").cast("string").alias("day"),
                "user_id",
                "event_type",
                "ets",
            )
            .dropDuplicatesWithinWatermark(["day", "user_id", "event_type"])
            .select("day", "user_id", "event_type")
        )
        return _drain_to_memory(keyed, "stream_dedup")


def stream_distinct_user_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-day distinct-user estimation via the integer-HLL
    registers (operators/sketches.py) — the sketch answer to Spark's
    hard restriction that streaming aggregations cannot contain
    COUNT(DISTINCT), and the bounded-state alternative to
    dropDuplicatesWithinWatermark when only the COUNT is needed:

    - stream_dedup_keys holds one state row PER DISTINCT KEY inside the
      watermark horizon (the price of emitting the keys themselves);
    - this holds exactly m register rows per open day window — constant
      per window regardless of arrival rate, because rho-max is an
      ordinary partial-aggregatable MAX the streaming agg state machine
      already knows how to fold incrementally.

    The drained (day, bucket, rho) registers are the SAME relation the
    batch build produces (streaming fold order cannot matter — max is
    commutative), so the post-drain estimate hash-matches the batch
    oracle; the ALL row is MAX-merged from the daily registers without
    touching the events again."""
    from ..operators import sketches
    from ..operators.dedup import token_hash
    from .online import drain_events_stream

    def transform(stream: DataFrame) -> DataFrame:
        h = token_hash(F.col("user_id").cast("string"))
        return (
            # explicit null-event-time drop (r7 adversarial-corpus rule)
            stream.where(F.col("ets").isNotNull())
            .withWatermark("ets", "1 day")
            .groupBy(
                F.window("ets", "1 day").alias("w"),
                sketches.hll_bucket(h).alias("bucket"),
            )
            .agg(F.max(sketches.hll_rho(h)).alias("rho"))
            .select(
                F.to_date(F.col("w.start")).cast("string").alias("day"),
                "bucket",
                "rho",
            )
        )

    regs = drain_events_stream(spark, sf_dir, transform, "stream_distinct_hll")
    merged = sketches.merge_hll_registers(
        regs.select(F.lit("ALL").alias("day"), "bucket", "rho"), ["day"]
    )
    return sketches.hll_estimate(regs, ["day"]).unionAll(
        sketches.hll_estimate(merged, ["day"])
    )
