"""Watermarked stream-stream joins (SURVEY.md §2.9 extension).

The streaming form of the batch interval join (operators.joins.range_join /
j8): two unbounded streams joined on an equi-key plus an event-time band.
Spark buffers BOTH sides in state and uses the watermarks + the time-range
condition to compute exactly how long each side must be retained — state is
bounded by (arrival rate × (watermark + band)), the textbook condition for
an unbounded deployment. Emitted pairs are keys only, so the availableNow
drain is deterministic and equals the batch range join the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _drain_to_memory
from .ts import staged_events_stream


def clicks_after_errors(
    spark: SparkSession,
    sf_dir: str,
    band: str = "2 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: each error joined to the same user's clicks
    within ``band`` after it.

    Both sides are branches of ONE file-source stream (a self-join — Spark
    plans them as two stateful join sides); each carries its own watermark,
    and the join condition's time band lets the engine evict error state
    once the click-side watermark passes error_ts + band, and click state
    once the error-side watermark passes the click's own event time.
    """
    with staged_events_stream(spark, sf_dir) as base:
        errors = (
            base.where(F.col("event_type") == "error")
            .select(
                F.col("event_id").alias("error_id"),
                F.col("user_id"),
                F.col("ets").alias("error_ts"),
            )
            .withWatermark("error_ts", watermark)
        )
        clicks = (
            base.where(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user_id"),
                F.col("ets").alias("click_ts"),
            )
            .withWatermark("click_ts", watermark)
        )
        joined = errors.join(
            clicks,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("click_ts") >= F.col("error_ts"))
            & (F.col("click_ts") <= F.col("error_ts") + F.expr(f"INTERVAL {band}")),
            "inner",
        ).select("error_id", "click_id", "user_id")
        return _drain_to_memory(joined, "stream_join")


def clicks_after_errors_outer(
    spark: SparkSession,
    sf_dir: str,
    band: str = "2 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every error, matched to its
    in-band clicks or null-extended once no match can still arrive.

    The subtle semantics this entry pins: an unmatched error emits its
    null row only when the WATERMARK passes the end of its match window
    (error_ts + band) — before that the engine must hold it, because a
    matching click could still be in flight. Under the availableNow drain
    the final watermark is max(ets) − ``watermark``, so exactly the
    unmatched errors with ``error_ts + band < max(ets) − watermark`` are
    null-extended; later unmatched errors stay in state, withheld. The
    oracle states that condition literally over the batch tables.
    """
    with staged_events_stream(spark, sf_dir) as base:
        errors = (
            base.where(F.col("event_type") == "error")
            .select(
                F.col("event_id").alias("error_id"),
                F.col("user_id"),
                F.col("ets").alias("error_ts"),
            )
            .withWatermark("error_ts", watermark)
        )
        clicks = (
            base.where(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user_id"),
                F.col("ets").alias("click_ts"),
            )
            .withWatermark("click_ts", watermark)
        )
        joined = errors.join(
            clicks,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("click_ts") >= F.col("error_ts"))
            & (F.col("click_ts") <= F.col("error_ts") + F.expr(f"INTERVAL {band}")),
            "leftOuter",
        ).select("error_id", "click_id", "user_id")
        return _drain_to_memory(joined, "stream_left_join")
