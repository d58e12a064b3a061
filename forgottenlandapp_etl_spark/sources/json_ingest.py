"""JSON ingestion scans S1–S3 (SURVEY.md §2.1).

The reference fetches nested JSON from an HTTP API and navigates it with
runtime type guards (etl.dart:95-102), tolerating malformed payloads. The
HTTP loop itself (pagination, retry, rate-limit — etl.dart:57-68, :62)
belongs to an ingestion client that lands raw page files; the engine's job
starts here: schema-declared `spark.read.json` over landed files, PERMISSIVE
mode with a corrupt-record column instead of runtime type checks, `explode`
at the edge, and null-safe struct access. Early-termination predicates
(level cutoff etl.dart:83, page cap :501) become plain filters/limits —
correctness stays in the engine, fetch-side optimizations stay in the
client.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Shapes inferred from the reference's field accesses (etl.dart:76, :95-102,
# :320-324, :495); _corrupt carries unparseable page payloads.
WORLDS_SCHEMA = (
    "worlds STRUCT<regular_worlds: ARRAY<STRUCT<name: STRING, location: STRING,"
    " pvp_type: STRING>>>, _corrupt STRING"
)

HIGHSCORES_SCHEMA = (
    "highscores STRUCT<world: STRING, category: STRING, page: INT,"
    " list: ARRAY<STRUCT<rank: INT, name: STRING, vocation: STRING,"
    " world: STRING, level: INT, value: BIGINT>>>, _corrupt STRING"
)

ONLINE_SCHEMA = (
    "world STRUCT<name: STRING, online_players: ARRAY<STRUCT<name: STRING,"
    " level: INT, vocation: STRING>>>, _corrupt STRING"
)


def _read(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """PERMISSIVE read: malformed documents land in ``_corrupt`` instead of
    failing the scan (the engine-side analog of etl.dart's is!-guards).

    ``multiLine=true``: one landed file per API page, pretty-printed or
    compact — without it a pretty-printed payload parses line-by-line into
    all-corrupt rows and the scan silently returns nothing.

    Downstream filters deliberately test the payload STRUCT for null rather
    than ``_corrupt``: PERMISSIVE populates _corrupt for ANY field-level
    type mismatch while nulling only the bad field, so filtering on
    _corrupt would throw away a whole 50-entry page over one bad field —
    the reference's per-element guards (etl.dart:95-102) keep the rest.
    """
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("multiLine", "true")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def read_worlds(spark: SparkSession, path: str) -> DataFrame:
    """S2 — worlds dimension scan (etl.dart:92-105): navigate
    ``worlds.regular_worlds``, explode, drop nulls/corrupt."""
    raw = _read(spark, path, WORLDS_SCHEMA)
    return (
        raw.where(F.col("worlds.regular_worlds").isNotNull())
        .select(F.explode("worlds.regular_worlds").alias("w"))
        .select("w.name", "w.location", "w.pvp_type")
        .where(F.col("name").isNotNull())
    )


def read_highscores_pages(spark: SparkSession, path: str) -> DataFrame:
    """S1/S4/U2 — landed highscores pages → one exploded entry relation.

    The union-across-pages (etl.dart:78, :496) is free: all page files read
    as one multi-file scan. Snapshot keys (world, category) ride along each
    entry row.
    """
    raw = _read(spark, path, HIGHSCORES_SCHEMA)
    h = raw.where(F.col("highscores.list").isNotNull())
    return h.select(
        F.col("highscores.world").alias("world"),
        F.col("highscores.category").alias("category"),
        F.explode("highscores.list").alias("e"),
    ).select(
        "world",
        "category",
        F.col("e.rank").alias("rank"),
        F.col("e.name").alias("name"),
        F.col("e.vocation").alias("vocation"),
        F.col("e.level").alias("level"),
        F.col("e.value").alias("value"),
    )


def read_online(spark: SparkSession, path: str) -> DataFrame:
    """S3/F7 — per-world online-players scan (etl.dart:309-332): explode the
    player list and stamp each row with its world (the F.lit tag becomes a
    column carried from the document itself — no per-world loop needed)."""
    raw = _read(spark, path, ONLINE_SCHEMA)
    w = raw.where(F.col("world.online_players").isNotNull())
    return w.select(
        F.col("world.name").alias("world"),
        F.explode("world.online_players").alias("p"),
    ).select(
        "world",
        F.col("p.name").alias("name"),
        F.col("p.level").alias("level"),
        F.col("p.vocation").alias("vocation"),
    )
