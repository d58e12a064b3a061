"""Structured Streaming variant of the online-time pipeline (SURVEY.md §2.9).

The reference's /online route is an external-cron micro-batch: every ~5
minutes, poll who's online and fold into a per-day accumulator
(etl.dart:291-307, :360-382). Here that is a real stream:

    readStream(poll files) → day-window count×5 per user → foreachBatch
    idempotent partition upsert

Batch (plans.reference_queries.a5_poll_minutes / e3_*) stays the semantic
source of truth; the stream is verified against it in tests. Exactly-once
comes from idempotent dynamic partition overwrite per micro-batch, matching
the reference's upsert+guard discipline.

Scope note: run_stream is the BOUNDED drain (availableNow). It uses
``complete`` output mode because the day-partition overwrite sink needs each
day's full aggregate per batch — and in complete mode the watermark does
NOT evict state, so this shape is wrong for an unbounded deployment. For
continuous operation use streaming/stateful.py (update-mode accumulator
with per-key state and optional idle-timeout eviction), whose sink upserts
only the keys each batch touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import sinks

POLL_SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, minutes_per_poll INT"


def daily_minutes(stream: DataFrame, minutes_per_poll: int = 5) -> DataFrame:
    """Tumbling day-window online minutes: count polls × cadence.

    Stateful streaming aggregation; state is bounded by (users × open
    windows) and the watermark closes day windows one day after they end.
    """
    return (
        stream.withWatermark("ts", "1 day")  # bounds state in update/append
        .groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg((F.count(F.lit(1)) * minutes_per_poll).cast("long").alias("minutes"))
        .select(
            F.to_date(F.col("w.start")).cast("string").alias("day"),
            "user_id",
            "minutes",
        )
    )


def run_stream(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    checkpoint_dir: str,
    minutes_per_poll: int = 5,
) -> None:
    """Drain available poll files into the daily online-time table.

    ``availableNow`` processes the backlog as micro-batches then stops —
    the cron-equivalent. ``foreachBatch`` + dynamic partition overwrite =
    idempotent day-partition upsert (the streaming form of K3).
    """
    stream = (
        spark.readStream.schema(POLL_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    agg = daily_minutes(stream, minutes_per_poll)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sinks.upsert_partitions(batch_df, out_path, partition_cols=("day",))

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def drain_events_stream(spark: SparkSession, sf_dir: str, transform, name: str) -> DataFrame:
    """Drain the events table through a streaming transformation and return
    the final result as a standalone batch DataFrame.

    ``transform(stream) -> DataFrame`` receives the file-source stream with
    the decoded event-time column ``ets`` already attached (streaming/ts.py
    probes the parquet footer and guards the decode by dtype — the round-2
    fix for the nanos-vs-micros collapse). The drain runs availableNow
    (whole backlog as micro-batches, then stop — deterministic, equal to
    the batch aggregate the DuckDB oracle computes), complete mode into a
    memory sink, then materializes the (small, aggregate-sized) result so
    the sink table / checkpoint / staging dirs can be released instead of
    accumulating across invocations.
    """
    import shutil
    import tempfile
    import uuid

    from .ts import staged_events_stream

    with staged_events_stream(spark, sf_dir) as stream:
        agg = transform(stream)
        qname = f"{name}_{uuid.uuid4().hex[:8]}"
        ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
        try:
            q = (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            # JVM-side materialization (same trick as dedup._drain_to_memory):
            # no driver→Python row round trip
            out = spark.table(qname).localCheckpoint(eager=True)
        finally:
            spark.catalog.dropTempView(qname)
            shutil.rmtree(ckpt, ignore_errors=True)
    return out


def stream_events_daily_counts(
    spark: SparkSession, sf_dir: str, name: str = "stream_daily_counts"
) -> DataFrame:
    """Structured-Streaming drain of the events table: file-source stream →
    1-day tumbling window count per (day, user) → in-memory sink."""

    def transform(stream: DataFrame) -> DataFrame:
        # explicit: event-time processing has no window for a null event
        # time; the engine would drop the row anyway — state the rule so
        # the oracle can state it too (r7 adversarial-corpus finding)
        return (
            stream.where(F.col("ets").isNotNull())
            .withWatermark("ets", "1 day")
            .groupBy(F.window("ets", "1 day").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.to_date(F.col("w.start")).cast("string").alias("day"),
                "user_id",
                "n_events",
            )
        )

    return drain_events_stream(spark, sf_dir, transform, name)


def stream_events_sliding_counts(
    spark: SparkSession, sf_dir: str, name: str = "stream_sliding_counts"
) -> DataFrame:
    """Hopping-window (1 h window, 30 min hop) event counts per event type.

    Every event lands in exactly window_size/hop = 2 overlapping windows;
    the watermark (2 h) bounds open-window state in an unbounded deployment
    (under the availableNow drain it simply closes everything). Window
    bounds are emitted as strings — Spark's timestamp→string cast and
    DuckDB's VARCHAR cast agree on the 'YYYY-MM-DD HH:MM:SS' form the
    oracle compares.
    """

    def transform(stream: DataFrame) -> DataFrame:
        # explicit null-event-time drop — same rule as the tumbling form
        return (
            stream.where(F.col("ets").isNotNull())
            .withWatermark("ets", "2 hours")
            .groupBy(
                F.window("ets", "60 minutes", "30 minutes").alias("w"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("w.start").cast("string").alias("window_start"),
                F.col("w.end").cast("string").alias("window_end"),
                "event_type",
                "n_events",
            )
        )

    return drain_events_stream(spark, sf_dir, transform, name)


def stream_events_enriched_counts(
    spark: SparkSession, sf_dir: str, name: str = "stream_static_enrich"
) -> DataFrame:
    """STREAM-STATIC join: the events stream enriched against the batch
    customer dimension, then day-windowed counts per nation.

    The third join mode Structured Streaming supports (beside stream-stream
    and batch-batch) and the most common one in production: facts stream
    in, dimensions sit in the warehouse. The static side is planned as a
    fresh BROADCAST per micro-batch — dimension updates between batches are
    picked up automatically, and the join itself is STATELESS (no
    watermark-bounded join state at all; only the downstream windowed
    aggregate keeps state). At 100 TB of stream the dimension broadcast is
    the same cost discipline as any batch broadcast join: dimension-sized,
    never fact-sized.
    """
    from .. import catalog

    dim = catalog.table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )

    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ets", "1 day")
            .join(F.broadcast(dim), on="user_id")  # stateless stream-static
            .groupBy(F.window("ets", "1 day").alias("w"), "c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.to_date(F.col("w.start")).cast("string").alias("day"),
                F.col("c_nationkey").alias("nation"),
                "n_events",
            )
        )

    return drain_events_stream(spark, sf_dir, transform, name)


def stream_events_topk_users(
    spark: SparkSession, sf_dir: str, k: int = 3, name: str = "stream_topk_users"
) -> DataFrame:
    """Streaming top-K: per 1-day tumbling window, the K most active users
    by event count.

    The streaming half is the real stateful work — a watermarked windowed
    count per (day, user), exactly stream_daily_counts' state shape. The
    RANK runs on the drained aggregate, not inside the stream: ranking is
    not an incremental-safe streaming aggregate (a late event can demote an
    already-emitted leader), so the production shape is
    stream-counts → serving-side top-K per window — the same split Kafka
    Streams / Flink deployments use, and under the availableNow drain it is
    exactly equal to the batch rank the oracle states. The rank window
    partitions by day (distributes across windows); ties break on user_id
    for determinism."""
    from pyspark.sql import Window

    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ets", "2 hours")
            .groupBy(F.window("ets", "1 day").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("w.start").cast("date").cast("string").alias("day"),
                "user_id",
                "n_events",
            )
        )

    counts = drain_events_stream(spark, sf_dir, transform, name)
    w = Window.partitionBy("day").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("day", "user_id", "n_events", F.col("rnk").cast("long").alias("rnk"))
    )
