"""The 10 reference route-equivalents (bin/server.dart:33-43) as Spark
pipelines over the domain data model (FIXTURES.md §2).

Extraction is out of engine scope (the reference's paginated HTTP fetch +
retry/rate-limit lives in an ingestion client, SURVEY.md §2.11); every route
takes already-landed DataFrames and composes the operator library:

    /currentexp   current_exp          F1 → W1 → K2
    /exprecord    exp_record           guard → F1 → W1 → K1
    /expgain+today|yesterday|7days|30days|365days
                  exp_gain             S5×2 → J1 → W1+W4 → K3/K1+K4
    /online       register_online      F2/F7/U1 → J3 (as A5 agg) → K3
                  + online_time_period J4 → W3+W4 → K1+K4
    /rookmaster   rook_master          S4×8 → J2 → A2 → W1+W4 → K1
    /calcskillpoints                   C1 (pure expression)

All tables are date-partitioned parquet; idempotency guards are partition
probes; retention is keep-latest partition rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import SKILL_CONSTANTS, skill_constants_df, skill_points
from ..operators import joins, windows
from ..sources import sinks

# persistent tables (SURVEY.md §1.1c), exploded layout, partitioned by the
# reference's lookup keys so every eq() probe partition-prunes
T_CURRENT_EXP = "current_exp"
T_EXP_RECORD = "exp_record"
T_EXP_GAIN = "exp_gain"  # partitioned by (period, date)
T_ONLINE = "online_now"
T_ONLINETIME = "onlinetime_daily"  # partitioned by date
T_ONLINETIME_PERIOD = "onlinetime_period"  # partitioned by (period, date)
T_ROOK_MASTER = "rook_master"


class ETLPipelines:
    """Route-equivalents over a parquet warehouse."""

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse = warehouse_dir

    # -- infrastructure ----------------------------------------------------

    def _path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def _read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self._path(table))

    def _table_exists(self, table: str) -> bool:
        return os.path.isdir(self._path(table))

    def exists(self, table: str, **preds) -> bool:
        """S6 idempotency guard (etl.dart:286-289): equality probe, pruned
        to a partition listing when the predicate hits partition keys."""
        if not self._table_exists(table):
            return False
        return joins.exists_probe(self._read(table), preds)

    # -- /currentexp and /exprecord (E1) ------------------------------------

    def current_exp(self, snapshot: DataFrame) -> DataFrame:
        """E1: min-level filter (F1) → sort (W1) → overwrite current state
        (K2). Returns what was written."""
        out = snapshot.where(F.coalesce("level", F.lit(0)) >= 30)
        ranked = windows.add_rank(
            out, [F.desc_nulls_last("value"), F.asc("name")], "rank"
        )
        sinks.overwrite_latest(ranked, self._path(T_CURRENT_EXP))
        return ranked

    def exp_record(self, snapshot: DataFrame, date: str) -> DataFrame | None:
        """E1 dated variant: idempotency guard (etl.dart:32) → insert (K1)."""
        if self.exists(T_EXP_RECORD, date=date):
            return None
        ranked = self.current_exp(snapshot).withColumn("date", F.lit(date))
        sinks.insert_snapshot(ranked, self._path(T_EXP_RECORD), ("date",))
        return ranked

    # -- /expgain* (E2, flagship) -------------------------------------------

    def exp_gain(self, date_from: str, date_to: str, period: str) -> DataFrame | None:
        """E2: two partition-pruned snapshot scans (S5) → diff join (J1) →
        rank (W4) → per-period upsert + keep-latest retention (K3+K4)."""
        if self.exists(T_EXP_GAIN, period=period, date=date_to):
            return None
        snaps = self._read(T_EXP_RECORD)
        today = snaps.where(F.col("date") == date_to)
        yday = snaps.where(F.col("date") == date_from)
        diff = joins.snapshot_diff(
            today, yday, key="name", value="value", gain_name="gain",
            dedupe_order="rank",
        )
        ranked = windows.add_rank(
            diff.select("name", "vocation", "world", "level", "gain"),
            [F.desc("gain"), F.asc("name")],
            "rank",
        )
        out = ranked.withColumn("period", F.lit(period)).withColumn(
            "date", F.lit(date_to)
        )
        sinks.upsert_partitions(out, self._path(T_EXP_GAIN), ("period", "date"))
        sinks.retention_keep_only(
            self.spark,
            self._path(T_EXP_GAIN),
            (F.col("period") != period) | (F.col("date") == date_to),
            partition_cols=("period", "date"),
        )
        return out

    # -- /online (E3) --------------------------------------------------------

    def register_online_players(self, polls: DataFrame, date: str) -> DataFrame:
        """E3: rookie/level filters (F2/F3) applied upstream of the poll
        relation; accumulate minutes per (date, user) as ONE aggregate over
        all polls of the day (the set-form of the per-poll merge J3) and
        upsert the day partition (K3)."""
        filtered = polls.where(F.coalesce("level", F.lit(0)) >= 10)
        daily = (
            filtered.groupBy("name")
            .agg(
                (F.count(F.lit(1)) * 5).cast("long").alias("time"),
                F.max_by("level", "poll_ts").alias("level"),
                F.max_by("world", "poll_ts").alias("world"),
            )
            .withColumn("date", F.lit(date))
        )
        ranked = windows.add_rank(
            daily, [F.desc("time"), F.desc("level"), F.asc("name")], "rank"
        )
        sinks.upsert_partitions(ranked, self._path(T_ONLINETIME), ("date",))
        return ranked

    def online_time_period(self, date_to: str, days: int, period: str) -> DataFrame | None:
        """E3 rollup: one BETWEEN-pruned scan of the daily table + groupBy
        (J4/A1/A3) instead of the reference's 365 sequential reads."""
        if self.exists(T_ONLINETIME_PERIOD, period=period, date=date_to):
            return None
        daily = self._read(T_ONLINETIME)
        start = F.date_sub(F.lit(date_to).cast("date"), days)
        rolled = joins.period_rollup(
            daily.where(
                (F.col("date").cast("date") > start)
                & (F.col("date").cast("date") <= F.lit(date_to).cast("date"))
            ),
            key="name",
            time_col="time",
            date_col="date",
            last_wins=("level", "world"),
        )
        ranked = windows.add_rank(
            rolled, [F.desc("time"), F.desc("level"), F.asc("name")], "rank"
        )
        out = ranked.withColumn("period", F.lit(period)).withColumn(
            "date", F.lit(date_to)
        )
        sinks.upsert_partitions(out, self._path(T_ONLINETIME_PERIOD), ("period", "date"))
        sinks.retention_keep_only(
            self.spark,
            self._path(T_ONLINETIME_PERIOD),
            (F.col("period") != period) | (F.col("date") == date_to),
            partition_cols=("period", "date"),
        )
        return out

    # -- /rookmaster ----------------------------------------------------------

    def rook_master(self, rankings: DataFrame, date: str) -> DataFrame | None:
        """8-category composite (etl.dart:426-471): long-format rankings
        (category, rank, name, value) → points enrichment (J2/C2/A2) → rank
        (W4) → dated insert (K1). Base = the 'experience' category."""
        if self.exists(T_ROOK_MASTER, date=date):
            return None
        base = rankings.where(F.col("category") == "experience").select(
            "name", F.col("value").alias("exp_value")
        )
        enriched = joins.enrich_points(
            base,
            rankings.select("name", "category", "rank"),
            key="name",
            rank_col="rank",
            total_name="total_points",
        )
        ranked = windows.add_rank(
            enriched, [F.desc("total_points"), F.asc("name")], "rank"
        ).withColumn("date", F.lit(date))
        sinks.insert_snapshot(ranked, self._path(T_ROOK_MASTER), ("date",))
        return ranked

    # -- /calcskillpoints -------------------------------------------------------

    def calc_skill_points(self, skill: str, value: int | None) -> int:
        """C1 endpoint (etl.dart:608-618): single-value evaluation of the
        pure Column formula (no UDF, no table scan)."""
        if skill not in SKILL_CONSTANTS:
            raise KeyError(f"unknown skill {skill!r}")
        df = self.spark.createDataFrame([(value,)], "value int").crossJoin(
            F.broadcast(skill_constants_df(self.spark).where(F.col("skill") == skill))
        )
        row = df.select(
            skill_points(F.col("value"), F.col("a"), F.col("b"), F.col("d")).alias("p")
        ).head()
        return int(row["p"])
