"""Join operators (SURVEY.md §2.4).

Every reference join is an O(n·m) nested-loop probe on ``name``
(etl.dart:234, :245-246, :370-372, :410-413, :552-554). Here each one is a
declarative equi-join: Catalyst picks broadcast-hash for dimension-sized
sides and sort-merge (AQE skew-split) for big-big, so the same code runs at
snapshot scale and at 100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import points_from_position


def first_match_dedupe(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """Reduce the build side to the FIRST row per key.

    The reference's probe is ``firstWhere`` (etl.dart:234): on duplicate
    names only the first list entry (lowest rank / input order) matches.
    Relational joins multiply on duplicates, so the build side is deduped
    with a per-key row_number — a map-side-combinable window, one shuffle.
    """
    w = Window.partitionBy(key).orderBy(F.col(order_col).asc_nulls_last())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def snapshot_diff(
    today: DataFrame,
    yesterday: DataFrame,
    key: str = "name",
    value: str = "value",
    gain_name: str = "gain",
    dedupe_order: str | None = None,
) -> DataFrame:
    """J1 — snapshot-diff join (etl.dart:229-241), the flagship operator.

    today ⋈ yesterday on ``key`` (inner: the existence clause of the
    validity predicate F5, etl.dart:243-247), gain = vₜ − vᵧ (C3, :235),
    keep positive gains (F4, :236). Null values on either side are dropped
    (F5's ``is int`` guards) — expressed as not-null filters so they push
    down into both scans.
    """
    t = today.where(F.col(value).isNotNull())
    y = yesterday.where(F.col(value).isNotNull())
    if dedupe_order is not None:
        y = first_match_dedupe(y, key, dedupe_order)
    y = y.select(F.col(key), F.col(value).alias("__y_value"))
    out = (
        t.join(y, on=key, how="inner")
        .withColumn(gain_name, F.col(value) - F.col("__y_value"))
        .where(F.col(gain_name) > 0)
        .drop("__y_value")
    )
    return out


def enrich_points(
    base: DataFrame,
    rankings: DataFrame,
    key: str = "name",
    category_col: str = "category",
    rank_col: str = "rank",
    total_name: str = "total_points",
) -> DataFrame:
    """J2 — multi-category enrichment (etl.dart:550-570, driven 7× :447-466).

    Long-format form: instead of 7 chained left joins (7 shuffles), the
    per-category rankings arrive unioned long (``category, key, rank``); one
    groupBy converts rank→points (C2) and sums per key, then a single left
    join attaches the total to the base ranking. Two shuffles total,
    independent of category count — the shape that survives 100× scale.
    """
    pts = (
        rankings.withColumn("__points", points_from_position(F.col(rank_col)))
        .groupBy(key)
        .agg(F.sum("__points").alias(total_name))
    )
    return base.join(pts, on=key, how="left").withColumn(
        total_name, F.coalesce(F.col(total_name), F.lit(0))
    )


def accumulating_merge(
    acc: DataFrame,
    batch: DataFrame,
    key: str = "name",
    time_col: str = "time",
    increment: int = 5,
    carry_cols: tuple[str, ...] = ("level",),
) -> DataFrame:
    """J3 — accumulating merge (etl.dart:360-382).

    Full-outer merge of the running accumulator with the current poll:
    matched → time += increment and carry columns take the batch's value;
    accumulator-only → unchanged; batch-only → appended with initial
    increment. One full-outer hash join replaces the reference's triple
    ``firstWhere`` probe per row (etl.dart:370-372).
    """
    b = batch.select(
        F.col(key), *[F.col(c).alias(f"__b_{c}") for c in carry_cols]
    ).withColumn("__present", F.lit(1))
    out = acc.join(b, on=key, how="full_outer")
    out = out.withColumn(
        time_col,
        F.coalesce(F.col(time_col), F.lit(0))
        + F.when(F.col("__present").isNotNull(), F.lit(increment)).otherwise(F.lit(0)),
    )
    for c in carry_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__b_{c}"), F.col(c)))
    return out.drop("__present", *[f"__b_{c}" for c in carry_cols])


def period_rollup(
    daily: DataFrame,
    key: str = "name",
    time_col: str = "time",
    date_col: str = "date",
    last_wins: tuple[str, ...] = ("level", "world"),
    start: Column | None = None,
    end: Column | None = None,
) -> DataFrame:
    """J4 — period rollup (etl.dart:397-424) as ONE scan + aggregate.

    The reference folds up to 365 sequential per-day reads into an in-memory
    accumulator; here a single partition-pruned scan with a BETWEEN filter
    feeds ``groupBy(key).agg(sum(time), max_by(…, date))`` — last-date-wins
    for the carry columns (etl.dart:412-413). Partial aggregation
    (map-side combine) makes this one shuffle of pre-aggregated state.
    """
    df = daily
    if start is not None:
        df = df.where(F.col(date_col) >= start)
    if end is not None:
        df = df.where(F.col(date_col) <= end)
    aggs = [F.sum(time_col).alias(time_col)]
    aggs += [F.max_by(c, date_col).alias(c) for c in last_wins]
    return df.groupBy(key).agg(*aggs)


def exists_probe(df: DataFrame, predicates: dict[str, object]) -> bool:
    """S6/J5 — existence probe (etl.dart:286-289).

    Conjunctive equality predicate + LIMIT 1 short-circuit; with partitioned
    tables the equality on the partition key makes this a metadata-only
    partition prune. Driver-side control flow (idempotency guards), hence
    the scalar return.
    """
    cond = reduce(
        lambda a, b: a & b, (F.col(k) == F.lit(v) for k, v in predicates.items())
    )
    return df.where(cond).limit(1).count() > 0


def semi_probe(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """J5 batched — left-semi join (the set form of the existence probe)."""
    return left.join(right, on=on, how="left_semi")


def anti_probe(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Anti-join — the set form of the retention ``neq`` delete (K4)."""
    return left.join(right, on=on, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right_ts <= left_ts`` within the same ``on`` key (left outer).

    Spark has no ASOF JOIN; the naive form is a range join that explodes to
    |left|×|right| per key. This is the scalable union formulation: tag both
    sides, sort once per key by (ts, side, tiebreak) with right rows ordered
    before left rows at equal ts (<= semantics), and carry the last right
    ROW forward with an unbounded-preceding frame. The carried marker is a
    STRUCT wrapping the value — non-null whenever a right row exists — so a
    right row whose value is legitimately NULL still wins (``last(value,
    ignorenulls)`` would skip past it to an older non-null row; true ASOF
    semantics return the most recent row's value, NULL included — the fuzz
    oracle suite caught the difference against DuckDB's ASOF JOIN). ONE
    shuffle on the key — linear, skew governed by the key like any window.

    Output: every left row + ``asof_<value>`` (null when no prior right row
    OR when the most recent prior right row's value is null).
    """
    tb = [F.col(tiebreak)] if tiebreak else []
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.struct(F.col(value).alias("v")).alias("__rv"),
        *( [F.col(tiebreak)] if tiebreak and tiebreak in right.columns else [] ),
    ).withColumn("__side", F.lit(0))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    u = lt.unionByName(rt.select(lt.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"), *tb)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn("__asof", F.last("__rv", ignorenulls=True).over(w)["v"])
    return (
        out.where(F.col("__side") == 1)
        .drop("__ts", "__side", "__rv")
        .withColumnRenamed("__asof", f"asof_{value}")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    interval: str,
) -> DataFrame:
    """Interval join: right rows with ``left_ts <= right_ts <= left_ts +
    interval`` within the same key.

    The equality on ``on`` keeps this a hash equi-join with the band as a
    residual filter — never a cartesian/broadcast-nested-loop. Skewed keys
    split by AQE. ``interval`` is a SQL interval literal (e.g. '10 minutes').
    """
    lt = left.alias("l")
    rt = right.alias("r")
    band = (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")) & (
        F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {interval}")
    )
    return lt.join(rt, (F.col(f"l.{on}") == F.col(f"r.{on}")) & band, "inner")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for extreme skew (SURVEY.md §4.3).

    AQE's skew-join splitting handles most skew by subdividing oversized
    partitions, but it cannot split a SINGLE hot key's build-side hash
    bucket. Salting does: the left (large, skewed) side gets a uniform
    random-free salt derived from a stable row hash, the right side is
    replicated ``salt_buckets`` times, and the join key becomes
    (key, salt) — spreading one hot key over ``salt_buckets`` tasks.
    Replication factor applies to the right side only; keep it the smaller
    relation. Deterministic (hash-derived salt, no rand()), so plans stay
    reusable and re-runs identical.

    ``how`` is restricted to the left-preserving families: the right side is
    replicated per salt, so right/full outer joins would emit each unmatched
    right row ``salt_buckets`` times — a correctness bug, not a perf one.
    """
    allowed = {
        "inner",
        "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi",
        "left_anti", "leftanti", "anti",
    }
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated right side "
            f"would duplicate unmatched right rows; use one of {sorted(allowed)}"
        )
    salt = (F.xxhash64(*[F.col(c) for c in left.columns]) % salt_buckets + salt_buckets) % salt_buckets
    lt = left.withColumn("__salt", salt.cast("int"))
    rt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = lt.join(rt, on=[on, "__salt"], how=how)
    return out.drop("__salt")
