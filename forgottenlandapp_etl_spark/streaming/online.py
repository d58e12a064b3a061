"""Structured Streaming variant of the online-time pipeline (SURVEY.md §2.9).

The reference's /online route is an external-cron micro-batch: every ~5
minutes, poll who's online and fold into a per-day accumulator
(etl.dart:291-307, :360-382). Here that is a real stream:

    readStream(poll files) → day-window count×5 per user → foreachBatch
    idempotent partition upsert

Batch (plans.reference_queries.a5_poll_minutes / e3_*) stays the semantic
source of truth; the stream is verified against it in tests. Late data: the
reference can't receive any (a poll only lands in "today"), mirrored by a
1-day watermark; exactly-once comes from idempotent dynamic partition
overwrite per micro-batch, matching the reference's upsert+guard discipline.
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
        stream.withWatermark("ts", "1 day")
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
