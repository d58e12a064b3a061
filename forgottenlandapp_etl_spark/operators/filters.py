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
    """F1/F3 — drop rows with (col ?? 0) < threshold (etl.dart:77, :361)."""
    return df.where(coalesce0(col) >= threshold)


def conjunctive(df: DataFrame, *predicates: Column) -> DataFrame:
    """F2 — conjunction of predicates (etl.dart:321)."""
    out = df
    for p in predicates:
        out = out.where(p)
    return out


def tag(df: DataFrame, name: str, value: object) -> DataFrame:
    """F7 — stamp every row with a literal source tag (etl.dart:322-324)."""
    return df.withColumn(name, F.lit(value))
