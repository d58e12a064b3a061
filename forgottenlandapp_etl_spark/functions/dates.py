"""Temporal derivation (SURVEY.md C6).

The reference keys every table by a "Tibia day" — the game's server-save
daily boundary, a fixed offset from UTC midnight (etl.dart DT.tibia.*,
inferred). Here that is a config constant applied as a timestamp shift
before ``to_date``; with offset 0 it degrades to plain UTC dates, which is
what the DuckDB-oracle queries use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Game-day boundary offset (hours before UTC midnight). Config, not hardcoded
# into expressions — oracle queries run with 0.
GAME_DAY_OFFSET_HOURS = 0


def game_day(ts: Column, offset_hours: int = GAME_DAY_OFFSET_HOURS) -> Column:
    """Event-time → game-day date key (etl.dart DT.tibia.today analog)."""
    if offset_hours:
        ts = ts - F.expr(f"INTERVAL {offset_hours} HOURS")
    return F.to_date(ts)


def date_range(start: Column, end: Column) -> Column:
    """DT.tibia.range(start, end) (etl.dart:404) → array of dates, inclusive.

    Explode the result to get one row per day; at scale this replaces the
    reference's up-to-365 sequential per-day reads with one partition-pruned
    scan plus a generated dimension.
    """
    return F.sequence(start, end, F.expr("INTERVAL 1 DAY"))
