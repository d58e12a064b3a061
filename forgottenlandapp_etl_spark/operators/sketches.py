"""Frequency sketches as engine-native column math.

Count-min sketch (Cormode & Muthukrishnan 2005), the streaming/distributed
heavy-hitter workhorse: d hash rows × w counters; every occurrence
increments one counter per row; the estimate for a key is the MIN of its d
counters — always ≥ the true count, and ≤ true + εN with probability
1−(1/2)^d for w = 2/ε.

Spark ships a binary ``count_min_sketch`` aggregate, but its serialized
form is opaque to any other engine. Building the sketch as a plain
(row, bucket, cnt) relation instead keeps it:

- exactly oracle-checkable (DuckDB mirrors the same integer math),
- mergeable by construction (sketches of two corpora merge via
  UNION ALL + re-aggregate — the same map-side-combine path Spark already
  uses for the build), and
- probe-able with an equi-join, i.e. everything stays in whole-stage
  codegen with one hash shuffle of (row, bucket) pairs — 100 TB-safe.

Hash family: the same seeded 31-bit-prime universal hashes the MinHash tier
uses (one source of truth for Spark and the generated SQL oracle).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import MERSENNE_31, token_hash

CMS_DEPTH = 4
CMS_WIDTH = 1024

_rng = random.Random(1337)
CMS_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, MERSENNE_31), _rng.randrange(0, MERSENNE_31))
    for _ in range(CMS_DEPTH)
]


def cms_bucket(h: Column, row: int) -> Column:
    """Counter index of pre-hashed key ``h`` in sketch row ``row``."""
    a, b = CMS_COEFFS[row]
    return ((F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_31)) % F.lit(CMS_WIDTH)


def build_count_min(keys: DataFrame, key_col: str = "token") -> DataFrame:
    """(row, bucket, cnt) sketch relation over every occurrence in ``keys``.

    Each occurrence explodes into DEPTH (row, bucket) pairs, then one hash
    aggregate with map-side combine — the sketch itself is at most
    DEPTH × WIDTH rows regardless of corpus size, so downstream probes can
    always broadcast against it."""
    h = token_hash(F.col(key_col))
    pairs = F.array(
        *[
            F.struct(F.lit(r).alias("row"), cms_bucket(h, r).alias("bucket"))
            for r in range(CMS_DEPTH)
        ]
    )
    return (
        keys.select(F.explode(pairs).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def probe_count_min(
    sketch: DataFrame, probes: DataFrame, key_col: str = "token"
) -> DataFrame:
    """Estimated occurrence count per probe key: min over the key's DEPTH
    counters. Probes explode into (row, bucket) lookups and equi-join the
    sketch; a probe key's buckets always exist in the sketch when the key
    occurred at all, so the inner join is lossless for present keys."""
    h = token_hash(F.col(key_col))
    pairs = F.array(
        *[
            F.struct(F.lit(r).alias("row"), cms_bucket(h, r).alias("bucket"))
            for r in range(CMS_DEPTH)
        ]
    )
    lookups = probes.select(F.col(key_col), F.explode(pairs).alias("rb")).select(
        key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    return (
        lookups.join(sketch, ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("n_est"))
    )
