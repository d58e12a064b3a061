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


def epoch_us(df, col: str) -> Column:
    """Zone-FREE epoch microseconds of a timestamp column, whatever dtype
    the parquet generation surfaced (the ts encoding is not fixed across
    testdata generations — see catalog._TS_COLUMNS).

    For TIMESTAMP (with-zone) the stored value IS the instant, so
    ``unix_micros`` is exact. For TIMESTAMP_NTZ, the tempting
    ``unix_micros(cast('timestamp'))`` interprets the wall clock in the
    SESSION zone — the offset cancels in *differences* only for
    fixed-offset zones; under a DST zone (e.g. Europe/Berlin) two events
    straddling a transition shift by DIFFERENT offsets and every
    staleness/gap computed from them is off by the DST delta (measured:
    3600 s vs the true 7200 s across the 2026-03-29 spring-forward).
    Field-based ``timestampdiff`` from the NTZ epoch never consults a
    zone, matching DuckDB's zone-less ``epoch_us()`` under ANY session
    zone. Takes the DataFrame (not just the column) because the right
    expression depends on the column's dtype.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "timestamp_ntz":
        return F.expr(
            "timestampdiff(MICROSECOND,"
            f" TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
        )
    return F.unix_micros(F.col(col))


def date_range(start: Column, end: Column) -> Column:
    """DT.tibia.range(start, end) (etl.dart:404) → array of dates, inclusive.

    Explode the result to get one row per day; at scale this replaces the
    reference's up-to-365 sequential per-day reads with one partition-pruned
    scan plus a generated dimension.
    """
    return F.sequence(start, end, F.expr("INTERVAL 1 DAY"))
