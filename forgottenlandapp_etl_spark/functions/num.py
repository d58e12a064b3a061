"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent, and a distributed engine sums in
whatever order partitions arrive — so a raw ``SUM(double)`` is not
reproducible run-to-run, let alone engine-to-engine against the DuckDB
oracle. Every money/measure aggregate in this engine therefore sums in
**exact decimal** (each double is rounded once, deterministically, to a
fixed scale; decimal addition is associative) and only casts back to double
at the end. This is also the right call at 100 TB: bit-stable results across
retries, speculative tasks, and AQE re-plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for 100 TB-scale sums of price-like values.
_PRECISION = 38


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-insensitive double sum: sum in DECIMAL(38,scale), cast back."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PRECISION},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic average: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def coalesce0(col: Column | str) -> Column:
    """The reference's pervasive ``x ?? 0`` (SURVEY.md C4)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(0))
