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


# ---------------------------------------------------------------------------
# HyperLogLog in exact integer arithmetic
# ---------------------------------------------------------------------------
#
# Flajolet et al. 2007: hash each key, split the hash into a bucket index
# (low p bits here, since the 31-bit token_hash has no high-bit slack) and a
# quotient q; register[bucket] = max over keys of rho(q), the 1-based
# position of q's leading 1-bit counted from the top of its fixed width.
# The estimate is alpha_m * m^2 / sum_b 2^(-reg_b).
#
# Spark's own hll_sketch_agg (and approx_count_distinct) serialize
# engine-specific binaries no other system can read — the reason
# sketch_hll_daily_merge is rows-only. This tier rebuilds the SAME
# structure as a plain (group, bucket, rho) relation in the cross-engine
# md5 hash domain, so:
#
# - the register table AND the estimate are exactly reproducible in any
#   SQL engine (the oracle generates the identical CASE/shift math from
#   these constants),
# - merge is GROUP BY bucket -> MAX(rho) — idempotent and commutative, so
#   re-merging overlapping periods is safe (unlike CMS counter addition),
# - the estimate's harmonic sum is computed SCALED BY 2^HLL_RHO_MAX so it
#   stays in BIGINT: sum_b 2^(RHO_MAX - reg_b) is exact integer math, and
#   alpha enters as an exact rational (paper constants / the 0.7213
#   formula), making the fixed-point estimate bit-identical everywhere.
#
# HLL_P = 4 (m = 16 registers) keeps the fixture-scale per-group
# cardinalities (~100 distinct users/day) inside raw-HLL's valid range
# (n > 2.5m); production would raise p — every function below takes the
# constants from here, and the scaled numerator alpha_num * 2^(32+p) only
# needs DECIMAL(38,0) widening past p = 11 (guarded below).

HLL_P = 4
HLL_M = 1 << HLL_P
#: token_hash() < 2^31, so after the p bucket bits the quotient has 31-p
HLL_Q_BITS = 31 - HLL_P
#: rho of an all-zero quotient (q == 0) — one past the last bit position
HLL_RHO_MAX = HLL_Q_BITS + 1


def hll_alpha(m: int) -> tuple[int, int]:
    """The paper's bias-correction constant alpha_m as an EXACT rational
    (numerator, denominator) — float alpha would break cross-engine
    bit-equality of the fixed-point estimate."""
    if m == 16:
        return 673, 1000
    if m == 32:
        return 697, 1000
    if m == 64:
        return 709, 1000
    # alpha_m = 0.7213 / (1 + 1.079/m) for m >= 128, kept rational
    return 7213 * m, 10000 * m + 10790


def hll_estimate_scale(m: int | None = None) -> tuple[int, int]:
    """(numerator, alpha_den) of the integer estimate: with the harmonic
    sum scaled by 2^RHO_MAX, E = num // (alpha_den * s_scaled). Reads the
    module constant at CALL time so precision-override tests stay
    consistent with the register builders."""
    m = HLL_M if m is None else m
    p = m.bit_length() - 1
    rho_max = 31 - p + 1
    a_num, a_den = hll_alpha(m)
    num = a_num * m * m * (1 << rho_max)
    if num >= 1 << 63:  # p >= 12: widen before this overflows BIGINT
        raise ValueError(f"HLL_P={p} needs DECIMAL(38,0) widening for the estimate")
    return num, a_den


def hll_bucket(h: Column) -> Column:
    """Register index: low HLL_P bits of the pre-hashed key."""
    return (h % F.lit(HLL_M)).cast("int")


def hll_rho(h: Column) -> Column:
    """1-based leading-1-bit position of the hash quotient within its
    HLL_Q_BITS width — a pure comparison ladder (exact integer branches,
    no log/float), mirrored verbatim by the generated SQL oracle."""
    q = F.shiftright(h.cast("int"), HLL_P)
    expr = F.lit(HLL_RHO_MAX)
    # build the CASE bottom-up so the first WHEN (largest threshold) wins
    for r in range(HLL_Q_BITS, 0, -1):
        expr = F.when(q >= F.lit(1 << (HLL_Q_BITS - r)), F.lit(r)).otherwise(expr)
    return expr.cast("int")


def hll_rho_sql(h_expr: str) -> str:
    """DuckDB CASE ladder identical to hll_rho — generated from the same
    constants so Spark and the oracle share one definition."""
    branches = " ".join(
        f"WHEN (({h_expr}) >> {HLL_P}) >= {1 << (HLL_Q_BITS - r)} THEN {r}"
        for r in range(1, HLL_Q_BITS + 1)
    )
    return f"CASE {branches} ELSE {HLL_RHO_MAX} END"


def build_hll_registers(
    keys: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., bucket, rho) register relation — at most m rows per
    group whatever the input size, built by one hash aggregate with
    map-side combine (rho max-combines partially exactly like a sum)."""
    group_cols = group_cols or []
    h = token_hash(F.col(key_col))
    return (
        keys.select(*group_cols, hll_bucket(h).alias("bucket"), hll_rho(h).alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def merge_hll_registers(
    regs: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union-merge register relations: MAX per bucket. Idempotent, so
    overlapping or repeated periods merge safely — the property that makes
    pre-aggregated daily registers answer ANY date-range distinct query
    without rescanning (the 100 TB COUNT(DISTINCT) replacement)."""
    group_cols = group_cols or []
    return regs.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(regs: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Fixed-point raw HLL estimate per group from a register relation.

    The harmonic sum is scaled: s = sum_occupied 2^(RHO_MAX - rho) +
    (m - n_occupied) * 2^RHO_MAX (absent buckets are empty registers), so
    E = alpha_num * m^2 * 2^RHO_MAX // (alpha_den * s) — integer end to
    end. Emits n_occupied too: consumers apply the paper's small-range
    linear-counting correction (needs V = m - n_occupied) outside the
    hash-compared path, since ln() is not cross-engine bit-stable."""
    group_cols = group_cols or []
    num, a_den = hll_estimate_scale()
    agg = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - rho)")
        ).alias("s_occ"),
        F.count(F.lit(1)).alias("n_occupied"),
    )
    return agg.select(
        *group_cols,
        F.col("n_occupied").cast("long").alias("n_occupied"),
        # coalesce: an ungrouped aggregate over ZERO rows still emits one
        # row (s_occ NULL, n_occupied 0) — the all-empty-register sum is 0
        F.expr(
            f"CAST({num} div ({a_den} * "
            f"(coalesce(s_occ, 0) + ({HLL_M} - n_occupied) * {1 << HLL_RHO_MAX}))"
            " AS BIGINT)"
        ).alias("n_est"),
    )


# ---------------------------------------------------------------------------
# Mergeable fixed-width histogram quantiles
# ---------------------------------------------------------------------------
#
# The distributed-quantile workhorse when you control the value domain:
# quantize values to fixed point, bucket by a fixed width, and a (group,
# bucket, cnt) relation is a SUM-mergeable summary whose q-quantile is
# bounded within one bucket width of the exact order statistic — the same
# partial-aggregate/merge contract as approx_percentile's KLL sketch
# (agg_approx_percentile, rows-only because KLL internals are
# engine-specific), but in plain integer math every engine reproduces
# bit-identically. Spark's own QuantileSummaries does the rank bookkeeping
# adaptively; the fixed grid trades adaptivity for exact cross-engine
# verifiability and O(domain/width) summary size.
#
# Estimates are the bucket LOWER BOUND of the bucket holding the
# ceil(q*N)-th element (percentile_disc semantics), so
# est_fp <= exact_fp < est_fp + width — asserted in tests.

#: fixed-point bucket width (value pre-scaled by consumers, e.g. cents);
#: 256 keeps the events.value domain to a few hundred buckets per group
HIST_WIDTH_FP = 256


def build_histogram(
    vals: DataFrame, val_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., bucket, cnt) over a NON-NEGATIVE fixed-point value
    column — one hash aggregate with map-side combine; negatives clamp to
    bucket 0 (Spark's `div` truncates toward zero where DuckDB's `//`
    floors, so the clamp is what keeps the two engines identical)."""
    group_cols = group_cols or []
    bucket = F.expr(f"GREATEST({val_col}, 0) div {HIST_WIDTH_FP}")
    return (
        vals.select(*group_cols, bucket.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histograms(
    hists: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union-merge histograms by counter addition (linear, like CMS)."""
    group_cols = group_cols or []
    return hists.groupBy(*group_cols, "bucket").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame,
    quantiles: list[tuple[str, int, int]],
    group_cols: list[str],
) -> DataFrame:
    """percentile_disc-style quantile estimates from a histogram: for each
    (label, num, den) the smallest bucket whose cumulative count reaches
    ceil(num/den * N), reported as its fixed-point lower bound.

    Quantile fractions travel as exact rationals — ceil(q*N) =
    (num*N + den - 1) div den in pure integers; a float q would put a
    rounding boundary inside the hash-compared path. The cumulative walk
    is a broadcast range self-join on the ≤ domain/width-row summary (the
    histogram is constant-sized by construction — NOT a window over the
    data), so nothing here scales with |input|."""
    cum = (
        hist.alias("a")
        .join(
            F.broadcast(hist.alias("b")),
            [F.col(f"a.{g}") == F.col(f"b.{g}") for g in group_cols]
            + [F.col("b.bucket") <= F.col("a.bucket")],
        )
        .groupBy(*[F.col(f"a.{g}").alias(g) for g in group_cols], F.col("a.bucket"))
        .agg(F.sum("b.cnt").alias("cum"))
    )
    n = hist.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    parts = []
    for label, num, den in quantiles:
        target = F.expr(f"({num} * n + {den - 1}) div {den}")
        parts.append(
            cum.join(n, group_cols)
            .where(F.col("cum") >= target)
            .groupBy(*group_cols)
            .agg(
                F.max("n").alias("n"),
                (F.min("bucket") * F.lit(HIST_WIDTH_FP)).alias("est_fp"),
            )
            .select(*group_cols, F.lit(label).alias("q"), "n", "est_fp")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# K-minimum-values sketch (distinct counts AND set intersections)
# ---------------------------------------------------------------------------
#
# Bar-Yossef et al. 2002 / the theta-sketch family: keep the k smallest
# DISTINCT hash values per group. The k-th smallest hash h_k estimates the
# distinct count as (k-1) * DOMAIN / h_k, and — the capability HLL
# fundamentally lacks — two groups' summaries COMPOSE for set algebra:
# the k smallest of the union of two summaries is exactly the union's
# summary, and the fraction of those that appear in both input summaries
# estimates the Jaccard, giving |A ∩ B| ≈ jaccard × |A ∪ B|. Everything
# is integer (hash comparisons, counts, one fixed-point division), so the
# whole build → merge → intersect path is hash-exact cross-engine.
#
# Summary size is k rows per group whatever the input; below k distinct
# values the sketch IS the exact distinct set and every estimate
# degenerates to the exact answer (the CASE below) — small groups are
# exact, big groups are within ~1/sqrt(k-1) RSE.

KMV_K = 64
#: the hash domain token_hash maps into — the estimate's numerator scale
KMV_DOMAIN = MERSENNE_31


def build_kmv(keys: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """(group..., h) k-minimum distinct-hash summary per group. NULL keys
    are dropped BEFORE ranking: Spark orders NULLS FIRST ascending where
    DuckDB defaults NULLS LAST, so a NULL reaching the window would pick
    different survivors per engine."""
    from pyspark.sql.window import Window

    h = token_hash(F.col(key_col))
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        keys.where(F.col(key_col).isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .drop("rn")
    )


def kmv_estimate(summaries: DataFrame, group_cols: list[str]) -> DataFrame:
    """Distinct-count estimate per group: exact below k (the summary holds
    every distinct hash), else the k-1 order-statistic estimator in
    integer division."""
    return summaries.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("cnt"), F.max("h").alias("hk")
    ).select(
        *group_cols,
        F.expr(
            f"CAST(CASE WHEN cnt < {KMV_K} THEN cnt"
            f" ELSE {(KMV_K - 1) * KMV_DOMAIN} div hk END AS BIGINT)"
        ).alias("n_est"),
    )
