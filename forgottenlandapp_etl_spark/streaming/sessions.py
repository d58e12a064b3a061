"""Streaming sessionization (SURVEY.md §2.9 extension): session_window
aggregation over the events stream — the continuous form of the batch
gaps-and-islands sessionizer (plans.relational_queries.agg_session_windows).

Append-mode session windows have a semantics worth stating precisely: a
session is emitted only when the WATERMARK passes its end (start of a gap
that can no longer be merged). Under an availableNow drain with a zero
delay, the final watermark is the max event time seen — so the drain emits
exactly the sessions that CLOSED before the stream's last event, and holds
(in state) any session still within one gap of it. That is the honest
unbounded-deployment behavior, and it is exactly oracle-expressible: batch
sessions WHERE session_end <= max(ts). (Complete mode is not supported for
session windows — state would never evict.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _drain_to_memory
from .ts import staged_events_stream

GAP = "30 minutes"  # inactivity gap, shared with the generated oracle


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events backlog through a watermarked session-window
    aggregate; returns (session_start, session_end, user_id, n) for every
    CLOSED session, as strings/longs matching the batch sessionizer."""
    with staged_events_stream(spark, sf_dir) as stream:
        sess = (
            stream.withWatermark("ets", "0 seconds")
            .groupBy(F.session_window("ets", GAP).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("w.start").cast("string").alias("session_start"),
                F.col("w.end").cast("string").alias("session_end"),
                "user_id",
                "n",
            )
        )
        return _drain_to_memory(sess, "stream_sessions")
