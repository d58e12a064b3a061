"""Skewed-fixture straggler test for the salted join path
(operators.joins.salted_join) at sf0.1.

A single hot key defeats both hash partitioning and AQE's skew split (AQE
subdivides oversized partitions of the SHUFFLE, but a single build-bucket
key still lands every probe row in one task's hash lookup stream). The
salted join must (a) return exactly the rows the plain join returns and
(b) actually spread the hot key's rows across many (key, salt) buckets —
the property that kills the straggler task at cluster scale.

Broadcast is disabled inside the test: with a broadcastable dim the
optimizer removes the shuffle entirely and the test would assert nothing
about the skew path salting exists for (both big sides, sort-merge).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from forgottenlandapp_etl_spark import catalog
from forgottenlandapp_etl_spark.operators import joins

SF01 = "/root/testdata/sf0.1"
HOT = 7  # the manufactured hot key
BUCKETS = 16


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _skewed_left(spark):
    """events at sf0.1 with ~one third of all rows collapsed onto HOT."""
    ev = catalog.table(spark, SF01, "events").select("event_id", "user_id", "value")
    return ev.withColumn(
        "k",
        F.when(F.col("event_id") % 3 == 0, F.lit(HOT)).otherwise(F.col("user_id")),
    )


def _dim(spark):
    return spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("w")
    )


def test_salted_join_equals_plain_join(spark, no_broadcast):
    left, dim = _skewed_left(spark), _dim(spark)
    agg = lambda df: df.agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("sw"),
        F.sum(F.col("value").cast("decimal(38,2)")).alias("sv"),
        F.sum(F.hash("event_id", "k", "w").cast("long")).alias("rowsig"),
    ).collect()[0]
    got = agg(joins.salted_join(left, dim, "k", salt_buckets=BUCKETS))
    want = agg(left.join(dim, on="k"))
    assert got == want
    assert want["n"] > 40_000  # the fixture is big enough to mean something


def test_salted_join_spreads_the_hot_key(spark, no_broadcast):
    """The actual straggler property: hot-key rows land in MANY physical
    output partitions of the join (the (key, salt) shuffle), not one.
    Measured with spark_partition_id() straight off the join output —
    AQE partition coalescing is disabled for the measurement so tiny test
    partitions aren't merged back together (at real scale the partitions
    are large and coalescing never undoes the salt spread)."""
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        left, dim = _skewed_left(spark), _dim(spark)
        out = joins.salted_join(left, dim, "k", salt_buckets=BUCKETS)
        per_part = (
            out.where(F.col("k") == HOT)
            .withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        counts = {r["p"]: r["n"] for r in per_part}
        total = sum(counts.values())
        assert total > 15_000  # the hot key really is hot
        # spread across many tasks, no single straggler share. The test
        # session runs 8 shuffle partitions, so the 16 (key,salt) buckets
        # land ~2 per partition with binomial wobble — max observed share
        # is ~⅓; the control test shows the unsalted share is 100%.
        assert len(counts) >= min(BUCKETS, 8)
        assert max(counts.values()) < 0.5 * total
        # task-level balance, not just spread: if salting silently stopped
        # spreading (e.g. a constant salt), the max partition would dwarf
        # the median; ~16 buckets over 8 partitions keeps max/median ≤ ~2-3
        # even with binomial wobble
        import statistics

        assert max(counts.values()) <= 4 * statistics.median(counts.values())
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)


def _zipf_left(spark):
    """events at sf0.1 re-keyed to a power-law (zipf-like) distribution:
    a deterministic md5-derived uniform is raised to the 5th power, so
    rank-0 holds ~25% of all rows ((1/1000)^(1/5) ≈ 0.251), rank-1 ~4%,
    and the tail thins out zipf-style — the many-keys-skewed shape real
    workloads have, vs. the single manufactured hot key above."""
    ev = catalog.table(spark, SF01, "events").select("event_id", "user_id", "value")
    u = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
    ).cast("double") / F.lit(float(2**60))
    return ev.withColumn("k", F.floor(F.pow(u, 5) * 1000).cast("long"))


def test_zipf_fixture_is_really_skewed(spark):
    """The premise the next two tests rest on: the generated key column
    has one key holding ≥20% of all rows."""
    left = _zipf_left(spark)
    total = left.count()
    top = left.groupBy("k").count().orderBy(F.desc("count")).first()
    assert top["k"] == 0
    assert top["count"] >= 0.20 * total


def test_salted_join_balances_zipf_keys(spark, no_broadcast):
    """Salted join on the zipf fixture: exact equality with the plain
    join, and the dominant key's rows spread across many physical
    partitions with the same task-balance bound as the single-hot-key
    test — the salting must survive a realistic power-law, not just a
    manufactured constant."""
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        left, dim = _zipf_left(spark), _dim(spark)
        agg = lambda df: df.agg(  # noqa: E731
            F.count(F.lit(1)).alias("n"),
            F.sum("w").alias("sw"),
            F.sum(F.col("value").cast("decimal(38,2)")).alias("sv"),
            F.sum(F.hash("event_id", "k", "w").cast("long")).alias("rowsig"),
        ).collect()[0]
        out = joins.salted_join(left, dim, "k", salt_buckets=BUCKETS)
        assert agg(out) == agg(left.join(dim, on="k"))
        per_part = (
            out.where(F.col("k") == 0)
            .withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        counts = {r["p"]: r["n"] for r in per_part}
        total = sum(counts.values())
        assert total > 15_000
        assert len(counts) >= min(BUCKETS, 8)
        assert max(counts.values()) < 0.5 * total
        import statistics

        assert max(counts.values()) <= 4 * statistics.median(counts.values())
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)


def test_aqe_skew_split_engages_on_zipf_join(spark, no_broadcast):
    """The OTHER skew defense the engine claims (session.py enables
    adaptive.skewJoin): AQE must actually subdivide the oversized
    partition on this fixture. Thresholds are scaled down to fixture
    bytes (defaults are 256 MB-class, sized for clusters); the assertion
    is the executed plan carrying a skew=true sort-merge join."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionNum": "1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # repartition(10) gives the join shuffle real MAPPERS: AQE splits
        # a skewed reduce partition at mapper-chunk granularity, and the
        # sf0.1 events parquet is one row group = one mapper, which makes
        # every reduce partition unsplittable (a fixture artifact — at
        # cluster scale the map side is always many tasks). Diagnosed via
        # OptimizeSkewedJoin debug logs: skew was DETECTED but yielded
        # "number of skewed partitions: 0" until the map side was split.
        left, dim = _zipf_left(spark).repartition(10), _dim(spark)
        # a genuinely shuffled-both-sides join (broadcast disabled by the
        # fixture), so the probe side's zipf partition is AQE's to split
        joined = left.join(dim, on="k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_plain_join_concentrates_the_hot_key(spark, no_broadcast):
    """Control: without salting, the hot key is one shuffle partition —
    the straggler the salted path exists to remove."""
    left, dim = _skewed_left(spark), _dim(spark)
    joined = left.join(dim, on="k")
    per_part = (
        joined.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = sorted((r["n"] for r in per_part), reverse=True)
    total = sum(counts)
    # hot key ≈ 1/3 of all rows in a single partition
    assert counts[0] >= 0.30 * total

def test_j11_entry_plan_carries_salt_fanout(spark, no_broadcast):
    """The oracle-paired registry entry (j11_salted_skew_join) must
    actually go through the salted path: the physical plan carries the
    16-way salt replication (explode of the salt array) and joins on the
    composite (event_type, __salt) key — so the hash-PASS vs the plain
    oracle proves salting is pure plan surgery, not a different query."""
    from forgottenlandapp_etl_spark.plans.registry import QUERIES

    df = QUERIES["j11_salted_skew_join"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, "salt key missing from the entry's physical plan"
    assert "explode" in plan.lower(), "salt replication (explode) missing"
