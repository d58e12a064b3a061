"""Aggregation operators (SURVEY.md §2.5).

All hash aggregates with partial (map-side) combine — the fold loops of the
reference (etl.dart:411, :566) become one-shuffle groupBy/agg pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.num import dsum


def range_sum(
    df: DataFrame,
    key: str,
    value: Column | str,
    alias: str = "total",
    scale: int = 2,
) -> DataFrame:
    """A1 — per-key sum over a (pre-filtered) date range (etl.dart:411)."""
    return df.groupBy(key).agg(dsum(value, scale).alias(alias))


def last_value_wins(df: DataFrame, key: str, value: str, order: str) -> DataFrame:
    """A3 — last-seen-wins (etl.dart:372, :412-413) via max_by."""
    return df.groupBy(key).agg(F.max_by(value, order).alias(value))


def poll_minutes(
    df: DataFrame, keys: list[str], minutes_per_poll: int = 5, alias: str = "time"
) -> DataFrame:
    """A5 — online minutes = polls-seen × cadence (etl.dart:371)."""
    return df.groupBy(*keys).agg(
        (F.count(F.lit(1)) * minutes_per_poll).cast("long").alias(alias)
    )
