"""Iterative graph algorithms over edge DataFrames (SURVEY.md §7.6 family:
corpus-hygiene graph analytics beside dedup.connected_components).

PageRank here is FIXED-POINT INTEGER PageRank: ranks live in a scaled
BIGINT domain and every per-iteration operation is integer arithmetic
(integer division for the per-neighbor contribution, integer percent for
the damping blend). Floating-point PageRank cannot be hash-compared across
engines — double summation order differs between Spark's shuffle order and
DuckDB's scan order, flapping the low bits — but integer sums are exact and
order-free, so THIS formulation is bit-identical in both engines and the
DuckDB oracle (generated from the same constants, unrolled iterations)
verifies the distributed implementation exactly, not "roughly".

Scale shape: each iteration is one equi-join of ranks onto the edge list
(partitioned by src) plus one hash aggregate on dst — the same two-shuffle
round as connected_components, with localCheckpoint cutting lineage so 10
iterations don't compound the plan. At cluster scale the edge relation is
persisted partitioned by src once and every iteration reuses that
partitioning, leaving the dst-aggregate as the only data movement per round.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed-point domain: 1.0 == 10^12. With N nodes the damped sum stays below
# 85 * N * SCALE, inside BIGINT for any corpus under ~10^5 nodes per
# connected component's mass concentration; the scale constant is shared
# with the generated DuckDB oracle.
PR_SCALE = 10**12
PR_DAMPING_PCT = 85  # damping d = 0.85, held as an integer percentage
PR_ITERATIONS = 10


def pagerank_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    iterations: int = PR_ITERATIONS,
) -> DataFrame:
    """Fixed-point integer PageRank: (id, rank_fp BIGINT) after
    ``iterations`` synchronous rounds.

    ``nodes``: one column ``id_col`` (every vertex, including isolated
    ones — they hold rank (1−d)·SCALE + their own damped share).
    ``edges``: directed (src, dst); symmetrize upstream for an undirected
    graph. Dangling nodes (no out-edges) simply don't contribute — their
    mass decays, which keeps the arithmetic exact rather than conserving
    probability mass (the oracle applies the identical rule).

    Update rule, all-BIGINT:
        contrib(u→v) = rank(u) DIV out_degree(u)
        rank'(v)     = (100−d)·SCALE DIV 100  +  d · Σ contrib DIV 100

    Only the ACTIVE subgraph iterates: a node with no edges at all can
    never receive a contribution nor send one, so its rank is the constant
    (1−d)·SCALE every round — it is attached once at the end instead of
    riding through ``iterations`` joins. For a near-dup graph over a clean
    corpus the active set is a tiny fraction of the vertex set, so this is
    the difference between iterating over |pairs| and iterating over
    |corpus| — the decisive cut at 100 TB, and the per-round working set
    is small enough that AQE runtime-broadcasts the rank side locally.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # the join side every iteration reuses: partitioned by src once.
    # Persisted AND eagerly materialized (count) — with a lazy persist the
    # (possibly expensive) edge upstream would recompute once per round
    # before the cache first fills.
    esrc = (
        edges.join(deg, on="src")
        .select("src", "dst", "deg")
        .repartition(F.col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    esrc.count()
    base = (100 - PR_DAMPING_PCT) * PR_SCALE // 100
    # active vertices = anything touching an edge; tiny, reused every round
    active = (
        esrc.select(F.col("src").alias("id"))
        .union(esrc.select(F.col("dst").alias("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    active.count()
    ranks = active.select("id", F.lit(PR_SCALE).cast("long").alias("rank_fp"))
    # checkpoint cadence: every round costs one scheduled job (~0.6 s of
    # pure scheduling latency on a small active set); every 2nd round
    # halves that while keeping lineage depth bounded at two join-agg
    # rounds. The final round ALWAYS checkpoints so the builds can release.
    ckpt_every = 2
    for it in range(iterations):
        contrib = (
            esrc.join(ranks, on=(F.col("src") == F.col("id")))
            .select("dst", F.expr("rank_fp div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            active
            .join(contrib, on=(F.col("id") == F.col("dst")), how="left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(f"{PR_DAMPING_PCT} * coalesce(s, 0) div 100")
                ).cast("long").alias("rank_fp"),
            )
        )
        # eager lineage cut (same discipline as connected_components); after
        # the loop `ranks` is materialized rows — so releasing the builds
        # below can never trigger recompute
        if (it + 1) % ckpt_every == 0 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    esrc.unpersist()
    active.unpersist()
    # isolated vertices hold the constant base rank; attach without iterating
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(ranks.withColumnRenamed("rank_fp", "r_active"), on="id", how="left")
        .select(
            "id", F.coalesce(F.col("r_active"), F.lit(base)).cast("long").alias("rank_fp")
        )
    )
