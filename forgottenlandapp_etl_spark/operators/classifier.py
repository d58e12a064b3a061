"""Hashed linear quality classifier — the fastText-style serving path.

Production corpus filtering scores every document with a linear
bag-of-hashed-tokens model (fastText / DSIR-style): each token hashes into
one of D weight buckets, the document score is the mean bucket weight, and
the keep decision is a threshold. At 100 TB the serving shape matters more
than the weights: tokenize → bucket → weight lookup → mean must stay in
whole-stage codegen with the weight table broadcast, never a Python loop.

Two paths, same semantics:

- :func:`hashed_score` — weights computed INLINE from the bucket id by a
  seeded universal hash (a deterministic synthetic model). Pure column
  math, integer until the final division, so the oracle checks it exactly.
- :func:`hashed_score_joined` — weights come from a (bucket, w_int)
  DataFrame: the pluggable path for REAL trained weights (load a parquet of
  fastText weights and pass it in). Broadcast equi-join; a test pins it to
  the inline path on the synthetic table.

The score is the raw linear mean in [0, 1); no sigmoid. The sigmoid is
monotone, so thresholding the linear score is equivalent for keep/drop —
and ``exp`` carries no IEEE correctly-rounded guarantee, which would break
bit-stable cross-engine comparison for no modeling gain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import MERSENNE_31, token_hash

N_BUCKETS = 4096
# seeded affine coefficients for the synthetic weight hash (shared with the
# generated SQL oracle — one source of truth)
WEIGHT_A = 1_103_515_245 % MERSENNE_31
WEIGHT_B = 12_345
KEEP_THRESHOLD = 0.5


def bucket_of(tok: Column) -> Column:
    """Token → weight-table bucket."""
    return token_hash(tok) % F.lit(N_BUCKETS)


def weight_int(bucket: Column) -> Column:
    """Synthetic integer weight of a bucket, uniform in [0, p)."""
    return (F.lit(WEIGHT_A) * bucket + F.lit(WEIGHT_B)) % F.lit(MERSENNE_31)


def synthetic_weights(spark: SparkSession) -> DataFrame:
    """The synthetic model materialized as the (bucket, w_int) relation the
    pluggable path consumes — broadcastable by construction (D rows)."""
    return spark.range(N_BUCKETS).select(
        F.col("id").cast("long").alias("bucket"),
        weight_int(F.col("id")).alias("w_int"),
    )


def _finish(grouped: DataFrame, id_col: str) -> DataFrame:
    # integer sum is exact and order-free; ONE division chain in doubles
    # (each op correctly rounded) keeps the score bit-identical cross-engine
    score = (F.col("_s").cast("double") / F.col("n_toks")) / F.lit(
        float(MERSENNE_31)
    )
    return grouped.select(
        F.col(id_col),
        F.col("n_toks"),
        score.alias("score"),
        (score >= F.lit(KEEP_THRESHOLD)).alias("keep"),
    )


def score_expr(text_col: str = "text") -> Column:
    """The classifier as a single reusable per-row Column (what composed
    pipelines embed): integer token-weight fold / token count / p."""
    toks = F.split(F.col(text_col), " ")
    s = F.aggregate(
        F.transform(toks, lambda t: weight_int(bucket_of(t))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (s.cast("double") / F.size(toks)) / F.lit(float(MERSENNE_31))


def hashed_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inline-weight scoring as a PER-ROW array fold: tokenize, weight each
    token by the synthetic bucket hash, integer-sum inside the row. ZERO
    shuffles — the score never leaves the scan's partition — and therefore
    also STATELESS: the identical expression runs under Structured
    Streaming (streaming/quality.py) with no watermark or state store.
    The explode+groupBy shape is only needed when weights come from a
    table (:func:`hashed_score_joined`)."""
    toks = F.split(F.col(text_col), " ")
    staged = df.select(
        F.col(id_col),
        F.aggregate(
            F.transform(toks, lambda t: weight_int(bucket_of(t))),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("_s"),
        F.size(toks).cast("long").alias("n_toks"),
    )
    return _finish(staged, id_col)


def hashed_score_joined(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pluggable-weight scoring: broadcast the (bucket, w_int) model table
    and equi-join the token stream — the path real trained weights take.
    Tokens whose bucket is absent from the model score 0 (left join +
    coalesce), matching fastText's missing-ngram behavior."""
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).select(F.col(id_col), bucket_of(F.col("tok")).alias("bucket"))
    g = (
        tok.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("w_int"), F.lit(0))).alias("_s"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )
    return _finish(g, id_col)
