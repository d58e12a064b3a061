"""Training-data export: deterministic global shuffle + sized shard writer.

A training run wants the corpus (a) in a pseudo-random order that is
REPRODUCIBLE — re-exporting after a retry, a cluster resize, or an engine
swap must yield byte-identical shards — and (b) cut into evenly sized
shards a data loader can stream. Spark's own randomness primitives give
neither: ``df.sample``/``rand(seed)`` depend on partition layout, and
``repartitionByRange`` samples its range boundaries at runtime.

Everything here derives from a content-independent 60-bit id hash:

  shuffle_key = fold60(md5(id || ':' || salt))   — the global order
  shard       = shuffle_key % n_shards           — the shard assignment

Both are pure column math (engine-portable, oracle-checkable); changing
``salt`` reshuffles the corpus for a new epoch without touching the data.
The physical export is one hash shuffle on ``shard`` + an in-partition
sort — no global sort, no single-reducer stage, so it scales to any shard
count a 1000-executor cluster wants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle_key(id_col: Column, salt: str) -> Column:
    """Engine-portable 60-bit shuffle key: md5 over ``id:salt``."""
    payload = F.concat(id_col.cast("string"), F.lit(":" + salt))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "epoch0",
    n_shards: int = 16,
) -> DataFrame:
    """Corpus in deterministic pseudo-random order, annotated with
    ``shuffle_key`` and ``shard``; physically clustered one-partition-per-
    shard and sorted by the key inside each shard.

    ``repartition(n, shard)`` hash-partitions the SHARD ID — with
    ``n == n_shards`` every shard lands wholly in one task, so each output
    file is a contiguous, fully sorted shard. The in-partition sort LEADS
    with ``shard``: the dynamic-partition writer requires child ordering by
    the partition columns and would otherwise insert its own (not
    guaranteed stable) sort on top, scrambling the key order. The unique id
    is the tiebreaker — hash collisions must not make order run-dependent."""
    key = shuffle_key(F.col(id_col), salt)
    out = df.withColumn("shuffle_key", key).withColumn(
        "shard", (F.col("shuffle_key") % n_shards).cast("int")
    )
    return out.repartition(n_shards, F.col("shard")).sortWithinPartitions(
        "shard", "shuffle_key", id_col
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    salt: str = "epoch0",
    n_shards: int = 16,
    fmt: str = "parquet",
    records_per_file: int | None = None,
) -> None:
    """Export the deterministic shuffle as ``n_shards`` shard directories
    (``shard=K/``) of ``fmt`` files, each file internally ordered by the
    shuffle key.

    ``records_per_file`` maps to ``maxRecordsPerFile`` — the standard knob
    for bounding file size so loaders get even work units; Spark splits a
    partition into consecutive files WITHOUT re-ordering, so sortedness
    survives the split. Overwrite mode keeps re-exports idempotent."""
    shuffled = deterministic_shuffle(df, id_col, salt, n_shards)
    w = shuffled.write.mode("overwrite").partitionBy("shard")
    if records_per_file is not None:
        w = w.option("maxRecordsPerFile", records_per_file)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "json":  # jsonl: one JSON document per line
        w.json(path)
    else:
        raise ValueError(f"write_training_shards: unsupported fmt {fmt!r}")
