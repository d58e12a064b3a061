"""Scalar functions (SURVEY.md §2.8) as pure Column expressions.

Everything here stays inside Catalyst whole-stage codegen — no Python UDFs.
Reference parity notes cite /root/reference/lib/src/etl.dart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# C1 — skill-points formula constants (etl.dart:573-603).
# points = floor((((b^((value ?? 10) - 10) - 1) / (b - 1)) * a) / d)
# a = base tries, b = growth factor, d = tries per skill point.
SKILL_CONSTANTS: dict[str, tuple[float, float, float]] = {
    "magic": (1600.0, 3.0, 30.0),
    "fist": (50.0, 1.5, 10.0),
    "axe": (50.0, 1.1, 10.0),
    "club": (50.0, 1.1, 10.0),
    "sword": (50.0, 1.1, 10.0),
    "distance": (30.0, 1.1, 10.0),
    "shielding": (100.0, 1.1, 10.0),
    "fishing": (20.0, 1.1, 10.0),
}


def skill_points(value: Column, a: Column, b: Column, d: Column) -> Column:
    """C1 — closed-form geometric-series tries→points (etl.dart:605).

    Null ``value`` is treated as the base skill 10 (etl.dart:605 ``?? 10``).
    Pure arithmetic → Catalyst codegen; the per-skill constants join in from
    a tiny lookup DataFrame (broadcast) or literal columns.
    """
    v = F.coalesce(value, F.lit(10)).cast("double")
    return F.floor(((F.pow(b, v - F.lit(10.0)) - F.lit(1.0)) / (b - F.lit(1.0))) * a / d).cast(
        "long"
    )


def skill_constants_df(spark: SparkSession) -> DataFrame:
    """The C1 constants as a broadcast-able lookup dimension."""
    rows = [(k, a, b, d) for k, (a, b, d) in SKILL_CONSTANTS.items()]
    return spark.createDataFrame(rows, "skill string, a double, b double, d double")


def points_from_position(position: Column) -> Column:
    """C2 — ranking points = 1000 - (position - 1)  (etl.dart:506, :556)."""
    return (F.lit(1000) - (position.cast("long") - F.lit(1))).cast("long")


def gain(today_value: Column, yesterday_value: Column) -> Column:
    """C3 — snapshot value difference (etl.dart:235)."""
    return today_value - yesterday_value


def try_int(col: Column, default: int = 0) -> Column:
    """C5 — ``int.tryParse(s) ?? default`` (etl.dart:612)."""
    return F.coalesce(col.cast("long"), F.lit(default))
