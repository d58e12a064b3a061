"""Training-mixture composition: temperature-smoothed domain resampling.

The standard multi-domain LM recipe (GPT-3 / PaLM style): sample domain d
with probability ∝ (n_d)^α, α < 1, so low-resource domains are upsampled
relative to their natural share and head domains are downsampled. Here the
temperature is fixed at α = 0.5 and implemented as ``sqrt`` — IEEE-754
requires sqrt (unlike pow) to be correctly rounded, so the computed rates
are bit-identical across engines and the whole mixture is reproducible
against the SQL oracle.

Scale shape: the per-domain count pass reads ONLY the domain column (column
pruning makes the extra scan a metadata-cheap pass — at 100 TB a pruned
re-scan beats caching the corpus), the rate table is domains-sized and
broadcast back, and the keep decision is a content-independent id-hash
threshold — deterministic across runs, engines, and cluster layouts, unlike
seeded ``df.sample``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import num

# 2^60: the id-hash domain (60-bit md5 fold). A power of two, so the
# double constant is exact and u = h / 2^60 is one correctly-rounded op.
HASH_DOMAIN = float(1 << 60)
# decimal scale for the order-insensitive sum of sqrt-weights
WEIGHT_SCALE = 9


def id_hash60(col: Column) -> Column:
    """Engine-portable 60-bit id hash (same fold as the dedup tiers)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def temperature_mix_rates(
    df: DataFrame, domain_col: str, target_frac: float = 0.5
) -> DataFrame:
    """Per-domain keep rates for a temperature-0.5 mixture.

    rate_d = min(1, (target_frac·N) · (√n_d / Σ√n) / n_d): the budget
    ``target_frac·N`` documents are allotted across domains proportionally
    to √n_d, then converted to a per-document probability. Σ√n uses the
    decimal-sum discipline (``num.dsum``) so the total — and therefore
    every rate — is independent of domain aggregation order.

    Two tiny aggregations (domains-sized after the first map-side-combined
    shuffle); the returned relation is broadcastable by construction.
    """
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(
        num.dsum(F.sqrt(F.col("n")), scale=WEIGHT_SCALE).alias("w"),
        F.sum("n").alias("n_total"),
    )
    rate = F.least(
        F.lit(1.0),
        ((F.lit(target_frac) * F.col("n_total")) * (F.sqrt(F.col("n")) / F.col("w")))
        / F.col("n"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "domain", rate.alias("rate")
    )


def temperature_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    target_frac: float = 0.5,
) -> DataFrame:
    """Deterministic temperature-mixture sample: keep a document iff its
    id-hash fraction u ∈ [0,1) falls below its domain's rate.

    The corpus relation joins the broadcast rate table and filters — one
    narrow pass over the data; selection is reproducible because u depends
    only on the id, never on partitioning or a seed."""
    rates = temperature_mix_rates(df, domain_col, target_frac)
    u = id_hash60(F.col(id_col)).cast("double") / F.lit(HASH_DOMAIN)
    return (
        df.join(F.broadcast(rates), df[domain_col] == rates["domain"])
        .where(u < F.col("rate"))
        .select(F.col(id_col), F.col("domain"), F.col("rate"))
    )
