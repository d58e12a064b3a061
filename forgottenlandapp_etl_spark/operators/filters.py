"""Filters / projections / predicates (SURVEY.md §2.3).

Each is a plain Column predicate so Catalyst pushes it into the parquet
scan (check ``PushedFilters`` in .explain). Null handling mirrors the
reference's ``?? 0`` coalesces (C4) explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.num import coalesce0


def min_value(df: DataFrame, col: str, threshold: int) -> DataFrame:
    """F1/F3 — drop rows with (col ?? 0) < threshold (etl.dart:77, :361).

    ``coalesce(col, 0) >= t`` defeats parquet filter pushdown (the scan
    can't evaluate coalesce), so the predicate is rewritten to the
    equivalent pushable form: for t > 0 nulls fail either way (``col >= t``
    alone); for t <= 0 nulls pass (``col IS NULL OR col >= t``). Same rows,
    but the filter now lands in ``PushedFilters`` and skips row groups via
    parquet min/max stats.
    """
    if threshold > 0:
        return df.where(F.col(col) >= threshold)
    return df.where(F.col(col).isNull() | (F.col(col) >= threshold))


def conjunctive(df: DataFrame, *predicates: Column) -> DataFrame:
    """F2 — conjunction of predicates (etl.dart:321)."""
    out = df
    for p in predicates:
        out = out.where(p)
    return out


def tag(df: DataFrame, name: str, value: object) -> DataFrame:
    """F7 — stamp every row with a literal source tag (etl.dart:322-324)."""
    return df.withColumn(name, F.lit(value))
