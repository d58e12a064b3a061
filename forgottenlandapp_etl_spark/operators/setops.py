"""Set operations (SURVEY.md §2.7)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """U1/U2 — union-by-name across worlds/pages (etl.dart:78, :325, :496).

    ``unionByName`` is a zero-shuffle narrow op; per-source tags (F7) are
    applied by callers before the union.
    """
    return reduce(lambda a, b: a.unionByName(b), dfs)
